"""Generate the blessed golden outputs for the hard rendered scene
(tests/golden/). Run from the repo root:  python scripts/make_golden.py

The golden pins pose drift across refactors (tests/test_hard_scene.py
::test_hard_scene_matches_golden compares gauge-free against it)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from test_hard_scene import run_hard_scene  # noqa: E402


def main():
    hs, engine, res = run_hard_scene()
    posed = np.nonzero(res.posed)[0]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden", "hard_scene_poses.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    intr = jax.tree_util.tree_map(np.asarray, engine.intr_np)
    np.savez_compressed(
        out,
        posed=posed,
        pose_c=res.pose_c,
        pose_R=res.pose_R,
        focal=np.atleast_2d(intr.scale)[0],
        disto=np.atleast_2d(intr.disto)[0],
    )
    print(f"golden written: {out} ({len(posed)} posed views)")


if __name__ == "__main__":
    main()
