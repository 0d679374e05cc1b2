"""Synthetic multi-view ground-truth scenes for tests and benchmarks.

TPU-native counterpart of the reference's NViewDataSet fixtures
(ref: src/aliceVision/multiview/NViewDataSet.hpp:21-74 —
NRealisticCamerasRing / NRealisticCamerasCardioid) and the SfM test bridge
(ref: src/aliceVision/sfm/utils/syntheticScene.hpp:85-93). Cameras sit on a
ring looking at the origin; points are sampled in a ball; projections are
exact (optionally noised). All arrays, no objects.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import camera as cam
from .. import geometry as geo


class SyntheticScene(NamedTuple):
    poses: geo.Pose  # batched (n_views,)
    intrinsics: cam.Intrinsics  # single shared row (unbatched)
    points: jnp.ndarray  # (n_points, 3) world
    observations: jnp.ndarray  # (n_views, n_points, 2) pixels
    visible: jnp.ndarray  # (n_views, n_points) bool (in front + in image)


def ring_scene(
    n_views: int = 12,
    n_points: int = 200,
    radius: float = 5.0,
    image_size=(1920, 1080),
    focal_px: float = 1200.0,
    noise_px: float = 0.0,
    disto_kind: int = cam.DISTO_NONE,
    disto_params=(),
    seed: int = 0,
    point_extent: float = 1.5,
) -> SyntheticScene:
    """Cameras on a ring of given radius in the z=0 plane, looking at origin."""
    key = jax.random.PRNGKey(seed)
    k_pts, k_noise = jax.random.split(key)

    angles = jnp.linspace(0.0, 2.0 * np.pi, n_views, endpoint=False)
    centers = radius * jnp.stack(
        [jnp.cos(angles), jnp.sin(angles), jnp.zeros_like(angles)], axis=-1
    )

    # Look-at rotation: camera z axis points from center to origin.
    fwd = -centers / jnp.linalg.norm(centers, axis=-1, keepdims=True)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), fwd.shape)
    right = jnp.cross(fwd, up)
    right = right / jnp.linalg.norm(right, axis=-1, keepdims=True)
    down = jnp.cross(fwd, right)
    # Rows of R are the camera axes expressed in world coords (world->cam).
    R = jnp.stack([right, down, fwd], axis=-2)
    poses = geo.pose_from_Rc(R, centers)

    points = point_extent * jax.random.ball(k_pts, 3, shape=(n_points,))

    intr = cam.make_intrinsics(
        image_size[0],
        image_size[1],
        focal_px,
        disto_kind=disto_kind,
        disto_params=disto_params,
    )

    x_cam = geo.transform(
        geo.Pose(q=poses.q[:, None, :], c=poses.c[:, None, :]), points[None, :, :]
    )  # (V, P, 3)
    obs = cam.project_cam(intr, x_cam)
    if noise_px > 0:
        obs = obs + noise_px * jax.random.normal(k_noise, obs.shape)

    w, h = image_size
    visible = (
        (x_cam[..., 2] > 0.1)
        & (obs[..., 0] >= 0)
        & (obs[..., 0] < w)
        & (obs[..., 1] >= 0)
        & (obs[..., 1] < h)
    )
    return SyntheticScene(
        poses=poses, intrinsics=intr, points=points, observations=obs, visible=visible
    )


def normalized_obs(scene: SyntheticScene) -> jnp.ndarray:
    """Observations lifted to the (undistorted) normalized camera plane."""
    p = cam.ima2cam(scene.intrinsics, scene.observations)
    return cam.remove_distortion(
        scene.intrinsics.disto_kind, scene.intrinsics.disto, p
    )


def ring_scene_sfmdata(
    n_views: int = 10,
    n_points: int = 100,
    image_size=(1920, 1080),
    focal_px: float = 1200.0,
    noise_px: float = 0.0,
    seed: int = 0,
):
    """Synthetic ring scene as a full SfMData — the generateSampleScene
    fixture (ref: sfmDataIO/sceneSample.hpp:18 generateSampleScene)."""
    import numpy as np

    from ..sfmdata.scene import SfMData

    syn = ring_scene(
        n_views=n_views, n_points=n_points, image_size=image_size,
        focal_px=focal_px, noise_px=noise_px, seed=seed,
    )
    sc = SfMData.empty()
    w, h = image_size
    ii = sc.add_intrinsic(1000, w, h, focal_px)
    for v in range(n_views):
        vi = sc.add_view(100 + v, ii, w, h, path=f"view_{v:04d}.jpg", frame_id=v)
        sc.set_pose(
            vi,
            np.asarray(geo.quat_to_mat(syn.poses.q[v]), np.float64),
            np.asarray(syn.poses.c[v], np.float64),
        )
    vis = np.asarray(syn.visible)
    obs = np.asarray(syn.observations)
    vv, ll = np.nonzero(vis)
    sc.set_structure(
        np.asarray(syn.points, np.float64),
        ll.astype(np.int32),
        vv.astype(np.int32),
        obs[vv, ll],
    )
    return sc
