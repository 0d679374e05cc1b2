"""Slice profile of the e2e featureExtraction stage wall on the chip:
image load, host->chip upload, extract dispatch, feature fetch, savez."""
import os
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

from alicevision_tpu.pipeline import stages
from alicevision_tpu.utils.render import make_test_dataset
from alicevision_tpu.features import sift


def main():
    tmp = tempfile.mkdtemp()
    img_dir = os.path.join(tmp, "imgs")
    make_test_dataset(img_dir, n_views=10)
    scene = os.path.join(tmp, "cameraInit.sfm")
    stages.camera_init(img_dir, scene, default_focal_px=400.0)

    from alicevision_tpu import sfmdata
    from alicevision_tpu.image.io import read_image

    sc = sfmdata.load(scene)
    t0 = time.perf_counter()
    imgs = [read_image(sc.view_paths[v], grayscale=True).astype(np.float32)
            for v in range(sc.n_views)]
    t_load = time.perf_counter() - t0
    print("image_load_s", round(t_load, 2), imgs[0].shape)

    cfg = sift.SiftConfig(max_keypoints=1024, dsp=False, n_octaves=4)

    def extract_one(im):
        f = sift.extract(im, cfg)
        return f._replace(
            desc=jnp.clip(f.desc * 512.0, 0.0, 255.0).astype(jnp.uint8))

    fn = jax.jit(jax.vmap(extract_one))
    stack8 = np.stack(imgs[:8])
    stack2 = np.stack([imgs[8], imgs[9]])

    # warm compile both shapes
    jax.block_until_ready(fn(jnp.asarray(stack8)))
    jax.block_until_ready(fn(jnp.asarray(stack2)))

    t0 = time.perf_counter()
    d8 = jax.device_put(stack8)
    jax.block_until_ready(d8)
    t_up = time.perf_counter() - t0
    print("upload8_s", round(t_up, 2), f"{stack8.nbytes/1e6:.1f} MB")

    t0 = time.perf_counter()
    out = fn(d8)
    jax.block_until_ready(out)
    t_disp = time.perf_counter() - t0
    print("extract8_dispatch_s", round(t_disp, 2))

    t0 = time.perf_counter()
    out_np = jax.tree_util.tree_map(np.asarray, out)
    t_fetch = time.perf_counter() - t0
    nbytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(out_np))
    print("fetch8_s", round(t_fetch, 2), f"{nbytes/1e6:.1f} MB")

    t0 = time.perf_counter()
    for g in range(8):
        np.savez_compressed(
            os.path.join(tmp, f"f{g}.npz"),
            xy=out_np.xy[g], scale=out_np.scale[g],
            orientation=out_np.orientation[g], response=out_np.response[g],
            desc=out_np.desc[g], valid=out_np.valid[g])
    t_save = time.perf_counter() - t0
    print("savez8_s", round(t_save, 2))

    # full stage for reference
    feats = os.path.join(tmp, "features")
    t0 = time.perf_counter()
    stages.feature_extraction(scene, feats, max_keypoints=1024,
                              downscale_to=0)
    print("full_stage_s", round(time.perf_counter() - t0, 2))


if __name__ == "__main__":
    main()
