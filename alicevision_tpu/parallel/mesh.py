"""Device mesh helpers for the multi-chip paths.

The reference scales out with per-process view chunks plus one-thread-per-GPU
fan-out (ref: src/software/pipeline/main_depthMapEstimation.cpp:414-419,
src/aliceVision/depthMap/computeOnMultiGPUs.cpp:15-67). The TPU-native
equivalent is a jax.sharding.Mesh with two logical axes:

  * "view"     — data parallelism over images (feature extraction, depth
                 maps, per-pair matching);
  * "landmark" — model parallelism over the BA landmark blocks (the reduced
                 camera system is assembled with psum over this axis).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_view: int | None = None, n_landmark: int | None = None, devices=None) -> Mesh:
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n_view is None and n_landmark is None:
        n_landmark = n
        n_view = 1
    elif n_view is None:
        n_view = n // n_landmark
    elif n_landmark is None:
        n_landmark = n // n_view
    assert n_view * n_landmark == n, (n_view, n_landmark, n)
    arr = np.asarray(devices).reshape(n_view, n_landmark)
    return Mesh(arr, axis_names=("view", "landmark"))


def shard_leading(mesh: Mesh, axis: str):
    """NamedSharding that splits the leading array dim over a mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
