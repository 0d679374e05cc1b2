"""Multi-host initialization and the pod-slice execution model.

The reference scales across machines with farm-chunked processes sharing a
filesystem (ref: SURVEY.md §2.8 — --rangeStart/--rangeSize + Meshroom).
The TPU-native replacement is a single jax.distributed program over a pod
slice:

  * call `init_distributed()` once per host (coordinator address from env
    or args) — after it, `jax.devices()` spans every chip in the slice and
    the Mesh built by parallel.mesh covers hosts transparently;
  * the "view" mesh axis is laid out host-major so per-view image loading
    stays host-local (each host feeds its own shard from disk, the analog
    of per-process range chunks) while BA's "landmark" axis communicates
    over ICI within hosts where possible;
  * stage checkpoints (the .sfm/.npy file contract) are written by host 0
    only, preserving the reference's resumable-pipeline behavior.

This module is exercised in CI only via the single-process path (the image
has one TPU); the multi-host code path follows the standard
jax.distributed.initialize contract.
"""

from __future__ import annotations

import os

import jax


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True if a multi-process runtime was initialized."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None:
        return False  # single-process run
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    pid = process_id if process_id is not None else int(
        os.environ.get("JAX_PROCESS_ID", "0")
    )
    if n <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=n, process_id=pid
    )
    return True


def is_primary() -> bool:
    """True on the host that writes stage checkpoints."""
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def host_local_view_range(n_views: int) -> tuple[int, int]:
    """The contiguous view range this host should load from disk — the
    in-process analog of the reference's --rangeStart/--rangeSize."""
    try:
        p = jax.process_index()
        n = jax.process_count()
    except Exception:
        p, n = 0, 1
    per = (n_views + n - 1) // n
    start = p * per
    return start, min(per, n_views - start)
