"""Two-process jax.distributed BA over a shared 8-device CPU mesh.

Proves the multi-host code path of parallel/distributed.py +
parallel/ba_sharded.py end to end: coordinator rendezvous, a global mesh
spanning two processes (2 "hosts" x 4 virtual devices), global arrays built
per-host with make_array_from_callback, and the landmark-sharded Schur BA
whose reduced camera system is psum-assembled across the process boundary.
Cost parity is asserted against the single-process solver (the DCN analog
of BASELINE's ">=80% at >=2 hosts" code path — throughput itself is
measured on real hardware by bench.py).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from alicevision_tpu.sfm import ba
from alicevision_tpu.parallel.ba_sharded import pad_problem_for_mesh

from test_sharded_ba import _problem


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_multihost_ba_two_processes(tmp_path):
    problem = _problem(n_views=10, n_points=300)

    # persist the problem for the workers (the shared-filesystem contract)
    leaves = {
        "cam_q": problem.cam_q,
        "cam_c": problem.cam_c,
        "points": problem.points,
        "obs_cam": problem.obs_cam,
        "obs_intr": problem.obs_intr,
        "obs_uv": problem.obs_uv,
        "obs_mask": problem.obs_mask,
        "cam_fixed": problem.cam_fixed,
        "point_fixed": problem.point_fixed,
        "i_cam_kind": problem.intr.cam_kind,
        "i_disto_kind": problem.intr.disto_kind,
        "i_scale": problem.intr.scale,
        "i_offset": problem.intr.offset,
        "i_size": problem.intr.size,
        "i_disto": problem.intr.disto,
    }
    npz = tmp_path / "problem.npz"
    np.savez(npz, **{k: np.asarray(v) for k, v in leaves.items()})

    single = ba.ba_solve(pad_problem_for_mesh(problem, 8), max_iters=12)
    single_cost = float(single.cost_final)

    port = _free_port()
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_ba_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.join(os.path.dirname(__file__), os.pardir)
    env.pop("XLA_FLAGS", None)  # workers set their own 4-device flag

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [sys.executable, worker, str(pid), "2", coord, str(npz), str(out)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=900)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    # both processes observe the same replicated result
    assert results[0]["cost_final"] == pytest.approx(results[1]["cost_final"])
    dist_cost = results[0]["cost_final"]
    assert np.isfinite(dist_cost)
    # parity with the single-process solve: 1e-2 relative — except when
    # both reached the noise floor (< 1e-3 of initial), where f32
    # reassociation across reduction orders dominates the residual
    c0 = results[0]["cost_initial"]
    rel = abs(dist_cost - single_cost) / max(abs(single_cost), 1e-30)
    deep = dist_cost < 1e-3 * c0 and single_cost < 1e-3 * c0
    assert rel <= 1e-2 or deep, (dist_cost, single_cost)
    assert dist_cost < results[0]["cost_initial"] * 1e-2
