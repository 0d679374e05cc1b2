"""Panorama CLI chain: estimation -> warping -> compositing on rendered
rotating-camera views."""

import os

import numpy as np
import pytest

from alicevision_tpu import camera as cam
from alicevision_tpu import sfmdata
from alicevision_tpu.pipeline.cli import main


@pytest.fixture(scope="module")
def pano_setup(tmp_path_factory):
    """Views of an equirect texture from a rotating pinhole camera."""
    import jax.numpy as jnp

    from alicevision_tpu.image.io import write_image
    from alicevision_tpu.image.processing import split_equirect

    d = tmp_path_factory.mktemp("pano")
    rng = np.random.RandomState(0)
    import scipy.ndimage as ndi

    pano_gt = ndi.gaussian_filter(rng.rand(256, 512).astype(np.float32), 1.5)
    imgs, K, Rs = split_equirect(jnp.asarray(pano_gt), n_splits=6, fov_deg=80.0,
                                 out_size=256)
    img_dir = str(d / "imgs")
    os.makedirs(img_dir)
    sc = sfmdata.SfMData.empty()
    ii = sc.add_intrinsic(1, 256, 256, float(np.asarray(K)[0, 0]))
    for i in range(6):
        p = os.path.join(img_dir, f"v{i}.png")
        write_image(p, np.asarray(imgs[i]))
        vi = sc.add_view(10 + i, ii, 256, 256, path=p)
        sc.set_pose(vi, Rs[i], np.zeros(3))
    scene_f = str(d / "rot.sfm")
    sfmdata.save(sc, scene_f)
    return str(d), scene_f, pano_gt


def test_panorama_warp_and_composite(pano_setup):
    d, scene_f, pano_gt = pano_setup
    warp_dir = os.path.join(d, "warped")
    assert main(["panoramaWarping", "--input", scene_f, "--output", warp_dir,
                 "--panoWidth", "512"]) == 0
    warps = [f for f in os.listdir(warp_dir) if f.endswith("_warp.npy")]
    assert len(warps) == 6

    out = os.path.join(d, "pano.png")
    assert main(["panoramaCompositing", "--input", warp_dir, "--output", out]) == 0
    from alicevision_tpu.image.io import read_image

    pano = read_image(out)
    assert pano.shape == (256, 512)
    # compare against ground truth where covered (equator band)
    masks = np.stack([
        np.load(os.path.join(warp_dir, f.replace("_warp", "_mask")))
        for f in sorted(warps)
    ])
    covered = masks.any(0)
    band = covered & (np.arange(256)[:, None] > 90) & (np.arange(256)[:, None] < 166)
    err = np.abs(pano - pano_gt)[band]
    assert np.median(err) < 0.06, np.median(err)
