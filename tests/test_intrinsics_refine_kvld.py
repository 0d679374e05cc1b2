import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu import camera as cam
from alicevision_tpu.matching.photometric_filter import photometric_filter
from alicevision_tpu.sfm import ba
from alicevision_tpu.utils.synthetic import ring_scene


def test_refine_intrinsics_recovers_focal_and_disto():
    """Observations made with the true intrinsics; the table starts with a
    perturbed focal/distortion and must recover them."""
    scene = ring_scene(
        n_views=8, n_points=150,
        disto_kind=cam.DISTO_RADIALK3, disto_params=(-0.12, 0.02, 0.0), seed=0,
    )
    vis = np.asarray(scene.visible)
    obs = np.asarray(scene.observations)
    o_lm, o_cam, o_uv = [], [], []
    for v in range(8):
        for l in np.nonzero(vis[v])[0]:
            o_lm.append(l); o_cam.append(v); o_uv.append(obs[v, l])

    wrong = scene.intrinsics._replace(
        scale=scene.intrinsics.scale * 1.03,  # 3% focal error
        disto=jnp.zeros(cam.DISTO_PARAMS),  # no distortion guess
    )
    intr = jax.tree_util.tree_map(lambda a: jnp.asarray(np.asarray(a))[None], wrong)
    problem = ba.build_problem(
        scene.poses.q, scene.poses.c, scene.points, intr,
        np.array(o_lm), np.array(o_cam), np.zeros(len(o_lm), np.int32),
        np.array(o_uv), max_track=8,
    )
    refined = ba.refine_intrinsics(
        problem, problem.cam_q, problem.cam_c, problem.points, iters=15
    )
    np.testing.assert_allclose(
        np.asarray(refined.scale[0]), np.asarray(scene.intrinsics.scale), rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(refined.disto[0, 0]), -0.12, atol=0.01
    )

    # rms after refinement should be small
    p2 = problem._replace(intr=refined)
    rms = ba.rms_reprojection_error(p2, problem.cam_q, problem.cam_c, problem.points)
    assert float(rms) < 0.5, float(rms)


def test_photometric_filter_rejects_bad_matches():
    rng = np.random.RandomState(0)
    import scipy.ndimage as ndi

    img1 = ndi.gaussian_filter(rng.rand(128, 128).astype(np.float32), 1.0)
    img2 = np.roll(img1, 5, axis=1)  # true correspondence: x2 = x1 + 5

    n = 40
    xy1 = rng.uniform(20, 108, (n, 2))
    good = np.stack([xy1[:, 0] + 5, xy1[:, 1]], -1)
    bad = rng.uniform(20, 108, (n, 2))
    is_good = rng.rand(n) < 0.5
    xy2 = np.where(is_good[:, None], good, bad)

    feats1 = {"xy": xy1, "scale": np.full(n, 2.0), "orientation": np.zeros(n)}
    feats2 = {"xy": xy2, "scale": np.full(n, 2.0), "orientation": np.zeros(n)}
    pairs = np.stack([np.arange(n), np.arange(n)], -1)
    kept, scores = photometric_filter(img1, img2, feats1, feats2, pairs, min_zncc=0.5)
    kept_mask = np.zeros(n, bool)
    kept_mask[kept[:, 0]] = True
    # keeps most good matches, rejects most bad ones
    assert kept_mask[is_good].mean() > 0.85
    assert kept_mask[~is_good].mean() < 0.25


def test_kvld_virtual_line_filter():
    """Full K-VLD: true matches across a shifted image survive; random
    outlier matches are rejected (ref: matching/kvld/kvld.h)."""
    import numpy as np
    import jax.numpy as jnp
    from alicevision_tpu.matching.kvld import kvld_filter
    from alicevision_tpu.image.filtering import gaussian_blur

    rng = np.random.RandomState(0)
    H, W, S = 160, 200, 12
    base = rng.rand(H, W + S).astype(np.float32)
    base = np.asarray(gaussian_blur(jnp.asarray(base), 2.0))
    img1 = base[:, :W]
    img2 = base[:, S:]

    n_in, n_out = 40, 20
    p1 = np.stack([rng.uniform(25, W - 25, n_in), rng.uniform(25, H - 25, n_in)], 1)
    p2 = p1 - np.array([S, 0.0])  # true correspondence
    o1 = np.stack([rng.uniform(25, W - 25, n_out), rng.uniform(25, H - 25, n_out)], 1)
    o2 = np.stack([rng.uniform(25, W - 25, n_out), rng.uniform(25, H - 25, n_out)], 1)
    xy1 = np.concatenate([p1, o1])
    xy2 = np.concatenate([p2, o2])

    keep = kvld_filter(img1, img2, xy1, xy2)
    inlier_keep = keep[:n_in].mean()
    outlier_keep = keep[n_in:].mean()
    assert inlier_keep > 0.8, inlier_keep
    assert outlier_keep < 0.3, outlier_keep
