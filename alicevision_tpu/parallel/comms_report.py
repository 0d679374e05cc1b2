"""Collective-traffic accounting for the distributed BA — the honest
scaling proxy in a 1-chip image.

Real >=2-host scaling efficiency cannot be measured here (one physical
chip); what CAN be measured exactly is the compiled SPMD program itself:
per LM iteration, how many bytes ride the collectives (psum/all-gather/
reduce-scatter inserted by XLA for the sharded Schur assembly) versus how
many FLOPs each shard computes locally. The projected efficiency at an
ICI-class link then follows from the roofline
    eff = t_compute / (t_compute + t_comms).
ref: SURVEY.md section 2.8 (distributed mapping); BASELINE.md ">=80% at
>=2 hosts" north star.
"""

from __future__ import annotations

import re

_SHAPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "s32": 4, "u64": 8, "u32": 4, "s8": 1, "u8": 1, "pred": 1,
}
_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "collective-permute",
    "all-to-all",
)
_SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|s32|u64|u32|s8|u8|pred)\[([0-9,]*)\]")


def _shapes_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _SHAPE_BYTES[dt]
    return total


def collective_bytes(hlo_text: str) -> dict:
    """{collective_kind: result bytes} summed over the HLO module.

    Handles both scalar results ("f32[6,128]{1,0} all-reduce(...") and
    TUPLE results ("(f32[32,21]{1,0}, f32[...]) all-reduce(..." — XLA
    fuses several psums into one tuple all-reduce)."""
    out: dict = {}
    for line in hlo_text.splitlines():
        ls = line.strip()
        if "=" not in ls:
            continue
        rhs = ls.split("=", 1)[1]
        for kind in _COLLECTIVES:
            m = re.search(rf"^\s*(.+?)\s+{kind}[(.]", rhs)
            if m:
                out[kind] = out.get(kind, 0) + _shapes_bytes(m.group(1))
                break
    return out


def ba_comms_table(
    shard_counts=(1, 2, 4, 8),
    n_points_per_shard: int = 1024,
    n_views: int = 32,
    ici_gbps: float = 45.0,  # one v5e ICI link direction ~45 GB/s
    # EFFECTIVE f32 throughput of this BA on the chip, not peak: measured
    # 192 LM it/s at ~2.8 GFLOP/iter on v5e => ~0.54 TFLOP/s achieved
    # (the block algebra is VPU-heavy, not MXU-dense). The roofline proxy
    # must use the achieved rate or it overstates the comms share.
    chip_tflops: float = 0.54,
) -> list[dict]:
    """Compile the sharded BA at several shard counts (virtual CPU mesh)
    and account collective bytes vs per-shard FLOPs for ONE LM iteration.
    Returns one row per shard count."""
    import jax

    import __graft_entry__ as g  # noqa: F401  (toy problem builder)
    from alicevision_tpu.parallel.ba_sharded import (
        make_sharded_ba,
        pad_problem_for_mesh,
        shard_problem,
    )
    from alicevision_tpu.parallel.mesh import make_mesh

    rows = []
    devices = jax.devices()
    for n in shard_counts:
        if len(devices) < n:
            continue
        mesh = make_mesh(n_view=1, n_landmark=n, devices=devices[:n])
        problem = g._toy_problem(
            n_views=n_views, n_points=n_points_per_shard * n, max_track=6
        )
        problem = pad_problem_for_mesh(problem, n)
        sharded = shard_problem(problem, mesh)
        fn = make_sharded_ba(mesh, max_iters=1)
        lowered = jax.jit(fn).lower(sharded)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        coll = collective_bytes(hlo)
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        total_coll = sum(coll.values())
        t_compute = flops / (chip_tflops * 1e12)
        t_comms = total_coll / (ici_gbps * 1e9)
        eff = t_compute / max(t_compute + t_comms, 1e-30)
        rows.append(
            {
                "shards": n,
                "collective_bytes": int(total_coll),
                "by_kind": {k: int(v) for k, v in coll.items()},
                "flops_per_shard": flops,
                "bytes_per_flop": total_coll / max(flops, 1.0),
                "projected_ici_efficiency": round(eff, 4),
            }
        )
    return rows


def fusion_comms_table(
    shard_counts=(1, 2, 4, 8),
    V: int = 32,
    hw=(272, 480),
    k: int = 4,
    ici_gbps: float = 45.0,
    chip_tflops: float = 0.54,
) -> list[dict]:
    """Collective accounting for the SHARDED DEPTH FUSION (config 5's
    second half): compile the ring-halo `make_sharded_consistency_filter`
    at several shard counts and report the ppermute halo bytes (2·k
    boundary maps per shard, independent of V and the shard count) vs
    per-shard FLOPs. V defaults to the realistic ≥32-view operating point
    BASELINE's ≥80%-at-≥2-hosts bar is stated at."""
    import jax
    import numpy as np

    from alicevision_tpu.mvs.sharded import make_sharded_consistency_filter
    from alicevision_tpu.parallel.mesh import make_mesh

    H, W = hw
    rng = np.random.RandomState(0)
    depths = rng.uniform(2.0, 8.0, (V, H, W)).astype(np.float32)
    K = np.tile(
        np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                 np.float32),
        (V, 1, 1),
    )
    ang = np.linspace(0, 0.5, V)
    R = np.stack([
        np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]], np.float32)
        for a in ang
    ])
    c = np.stack([np.array([0.5 * a, 0, 0], np.float32) for a in ang])

    rows = []
    devices = jax.devices()
    for n in shard_counts:
        if len(devices) < n or V % n:
            continue
        mesh = make_mesh(n_view=n, n_landmark=1, devices=devices[:n])
        fn = make_sharded_consistency_filter(mesh, k=k)
        compiled = jax.jit(fn).lower(depths, K, R, c).compile()
        coll = collective_bytes(compiled.as_text())
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        total_coll = sum(coll.values())
        t_compute = flops / (chip_tflops * 1e12)
        t_comms = total_coll / (ici_gbps * 1e9)
        eff = t_compute / max(t_compute + t_comms, 1e-30)
        rows.append(
            {
                "shards": n,
                "collective_bytes": int(total_coll),
                "by_kind": {k: int(v) for k, v in coll.items()},
                "flops_per_shard": flops,
                "bytes_per_flop": total_coll / max(flops, 1.0),
                "projected_ici_efficiency": round(eff, 4),
            }
        )
    return rows
