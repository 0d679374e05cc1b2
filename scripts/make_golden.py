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
from test_golden_mvs import run_depth_golden, run_mesh_golden  # noqa: E402


def main():
    hs, engine, res = run_hard_scene()
    posed = np.nonzero(res.posed)[0]
    golden_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "golden",
    )
    os.makedirs(golden_dir, exist_ok=True)
    out = os.path.join(golden_dir, "hard_scene_poses.npz")
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

    # MVS/meshing statistics golden (depth accuracy, mesh fidelity) —
    # the regression gates of tests/test_golden_mvs.py
    stats = dict(run_depth_golden())
    stats.update(run_mesh_golden())
    out2 = os.path.join(golden_dir, "mvs_stats.npz")
    np.savez_compressed(out2, **{k: np.float64(v) for k, v in stats.items()})
    print(f"golden written: {out2}: {stats}")


if __name__ == "__main__":
    main()
