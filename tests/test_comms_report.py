"""HLO collective-bytes accounting (parallel/comms_report.py) — parser
unit tests + a live compile check on the virtual mesh (the scaling proxy
behind BASELINE's >=80% multi-host north star)."""

import numpy as np

from alicevision_tpu.parallel.comms_report import collective_bytes


def test_collective_bytes_scalar_and_tuple_results():
    hlo = """
HloModule m
  %x = f32[6,128]{1,0} all-reduce(%a), replica_groups={}
  %y = (f32[32,21]{1,0}, f32[4]{0}) all-reduce(%b, %c), channel_id=1
  %z = bf16[2,2]{1,0} all-gather(%d), dimensions={0}
  %w = f32[8]{0} add(%e, %f)
"""
    out = collective_bytes(hlo)
    assert out["all-reduce"] == 6 * 128 * 4 + (32 * 21 * 4 + 4 * 4)
    assert out["all-gather"] == 2 * 2 * 2
    assert "add" not in out


def test_collective_bytes_ignores_noncollectives():
    hlo = "%q = f32[10]{0} reduce(%a, %b), dimensions={0}"
    assert collective_bytes(hlo) == {}


def test_ba_comms_weak_scaling_on_virtual_mesh():
    """Compiled sharded BA: collective bytes must be SMALL and constant-ish
    across shard counts (the reduced-system psum, not landmark gathers),
    and per-shard FLOPs must not grow with the shard count."""
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()
    from alicevision_tpu.parallel.comms_report import ba_comms_table

    rows = ba_comms_table(shard_counts=(1, 2, 4), n_points_per_shard=512,
                          n_views=16)
    by = {r["shards"]: r for r in rows}
    assert by[1]["collective_bytes"] == 0
    # the psum payload is the reduced system (~C^2 blocks), far below the
    # landmark data an all-gather regression would move
    for n in (2, 4):
        assert by[n]["collective_bytes"] < 500_000, by[n]
    # weak scaling: per-shard flops roughly constant (allow 30% overhead)
    assert by[4]["flops_per_shard"] < by[1]["flops_per_shard"] * 1.3
