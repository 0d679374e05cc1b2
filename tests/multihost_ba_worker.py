"""Worker process for the 2-host jax.distributed BA test.

Usage: python multihost_ba_worker.py <pid> <nproc> <coordinator> <npz> <out>

Each worker owns 4 virtual CPU devices; together the two processes form the
8-device global mesh. The BAProblem is loaded from a shared .npz (both
processes see identical data, the multi-host analog of each host loading
its view shard from the shared filesystem) and turned into global arrays
with jax.make_array_from_callback. The solve is the same
make_sharded_ba path CI runs single-process — this test proves the DCN
(multi-process) wiring of SURVEY.md §2.8 / BASELINE "≥2 hosts".
"""

import json
import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    coord, npz_path, out_path = sys.argv[3], sys.argv[4], sys.argv[5]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from alicevision_tpu.parallel.distributed import init_distributed

    assert init_distributed(coord, nproc, pid)
    assert jax.process_count() == nproc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from alicevision_tpu import camera as cam
    from alicevision_tpu.sfm import ba
    from alicevision_tpu.parallel.ba_sharded import (
        make_sharded_ba,
        pad_problem_for_mesh,
    )
    from alicevision_tpu.parallel.mesh import make_mesh

    d = np.load(npz_path)
    intr = cam.Intrinsics(
        cam_kind=jnp.asarray(d["i_cam_kind"]),
        disto_kind=jnp.asarray(d["i_disto_kind"]),
        scale=jnp.asarray(d["i_scale"]),
        offset=jnp.asarray(d["i_offset"]),
        size=jnp.asarray(d["i_size"]),
        disto=jnp.asarray(d["i_disto"]),
    )
    problem = ba.BAProblem(
        cam_q=jnp.asarray(d["cam_q"]),
        cam_c=jnp.asarray(d["cam_c"]),
        points=jnp.asarray(d["points"]),
        intr=intr,
        obs_cam=jnp.asarray(d["obs_cam"]),
        obs_intr=jnp.asarray(d["obs_intr"]),
        obs_uv=jnp.asarray(d["obs_uv"]),
        obs_mask=jnp.asarray(d["obs_mask"]),
        cam_fixed=jnp.asarray(d["cam_fixed"]),
        point_fixed=jnp.asarray(d["point_fixed"]),
    )

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 global devices, got {len(devs)}"
    mesh = make_mesh(n_view=2, n_landmark=4, devices=devs)
    problem = pad_problem_for_mesh(problem, 8)

    lm = NamedSharding(mesh, P(("view", "landmark")))
    rep = NamedSharding(mesh, P())

    def gput(a, sh):
        a_np = np.asarray(a)
        return jax.make_array_from_callback(a_np.shape, sh, lambda idx: a_np[idx])

    problem = ba.BAProblem(
        cam_q=gput(problem.cam_q, rep),
        cam_c=gput(problem.cam_c, rep),
        points=gput(problem.points, lm),
        intr=jax.tree_util.tree_map(lambda a: gput(a, rep), problem.intr),
        obs_cam=gput(problem.obs_cam, lm),
        obs_intr=gput(problem.obs_intr, lm),
        obs_uv=gput(problem.obs_uv, lm),
        obs_mask=gput(problem.obs_mask, lm),
        cam_fixed=gput(problem.cam_fixed, rep),
        point_fixed=gput(problem.point_fixed, lm),
    )

    fn = make_sharded_ba(mesh, max_iters=12)
    res = fn(problem)
    out = {
        "pid": pid,
        "cost_initial": float(np.asarray(res.cost_initial)),
        "cost_final": float(np.asarray(res.cost_final)),
        "n_iters": int(np.asarray(res.n_iters)),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
