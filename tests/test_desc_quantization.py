"""On-chip descriptor quantization: uint8 leaves the device, matching is
bit-identical to the host-quantized path.

ref: src/aliceVision/feature/Descriptor.hpp — the reference's SIFT
descriptor element type is unsigned char end-to-end; round 4 moved f32
over the relay and quantized only at file write (features/io.py).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from alicevision_tpu.features import sift
from alicevision_tpu.matching import descriptor_matching as dm
from alicevision_tpu.pipeline import stages


def _two_views(tmp_path, W=160, H=120):
    rng = np.random.RandomState(0)
    import scipy.ndimage as ndi

    base = ndi.gaussian_filter(rng.rand(H, W * 2).astype(np.float32), 1.2)
    base = (base - base.min()) / (base.max() - base.min())
    img_dir = str(tmp_path / "imgs")
    os.makedirs(img_dir)
    for i in range(2):
        np.save(
            os.path.join(img_dir, f"v{i}.npy"),
            base[:, i * 20 : i * 20 + W],
        )
    return img_dir


def test_stage_writes_uint8_and_matching_is_bit_identical(tmp_path):
    img_dir = _two_views(tmp_path)
    scene_f = str(tmp_path / "s.sfm")
    sc = stages.camera_init(img_dir, scene_f, default_focal_px=200.0)
    feats_dir = str(tmp_path / "feats")
    stages.feature_extraction(
        scene_f, feats_dir, max_keypoints=256, downscale_to=0,
        describer_types="sift",
    )
    # 1) the stored descriptors are uint8 (4x smaller fetch + file)
    raw = np.load(os.path.join(feats_dir, f"{int(sc.view_ids[0])}.feat.npz"))
    assert raw["desc"].dtype == np.uint8

    # 2) load_features dequantizes to f32/512
    f0 = stages.load_features(feats_dir, int(sc.view_ids[0]))
    f1 = stages.load_features(feats_dir, int(sc.view_ids[1]))
    assert f0["desc"].dtype == np.float32
    assert float(f0["desc"].max()) <= 255.0 / 512.0 + 1e-6

    # 3) bit-identical matches vs the host-quantized reference path:
    #    extract f32 directly, quantize exactly like the chip does, match
    cfg = sift.SiftConfig(max_keypoints=256, dsp=False, n_octaves=4)
    from alicevision_tpu.image.io import read_image

    m_stage, m_host = [], []
    host_feats = []
    for i in range(2):
        img = read_image(os.path.join(img_dir, f"v{i}.npy"), grayscale=True)
        f = sift.extract(jnp.asarray(img), cfg)
        q = np.clip(np.asarray(f.desc) * 512.0, 0, 255).astype(np.uint8)
        host_feats.append(
            {"desc": q.astype(np.float32) / 512.0,
             "valid": np.asarray(f.valid)}
        )
    for (fa, fb), out in (((f0, f1), m_stage), (host_feats, m_host)):
        m = dm.match_bruteforce(
            jnp.asarray(fa["desc"]), jnp.asarray(fb["desc"]),
            jnp.asarray(fa["valid"]), jnp.asarray(fb["valid"]),
        )
        out.append(np.asarray(m.idx2))
    assert np.array_equal(m_stage[0], m_host[0]), (
        "on-chip quantized matching diverged from host-quantized matching"
    )
