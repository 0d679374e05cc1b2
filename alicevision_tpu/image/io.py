"""Host-side image IO + EXIF metadata (compute stays in JAX).

Counterpart of the reference's OIIO-backed IO (ref:
src/aliceVision/image/io.cpp:13-17) and the EXIF-driven camera init
(ref: src/software/pipeline/main_cameraInit.cpp:323-343). Uses
imageio/PIL/cv2 at the edges — the compute path only ever sees float
arrays. EXR written through cv2 when available (depth/sim maps), with a
.npy fallback so the pipeline never hard-fails on codec support.
"""

from __future__ import annotations

import os

import numpy as np

_EXR_ENABLED = False
try:  # cv2 EXR needs an env opt-in
    os.environ.setdefault("OPENCV_IO_ENABLE_OPENEXR", "1")
    import cv2  # noqa: F401

    _EXR_ENABLED = True
except Exception:  # pragma: no cover
    cv2 = None


def read_image(path: str, grayscale: bool = False) -> np.ndarray:
    """Read any common format -> float32 in [0, 1], (H, W[, 3])."""
    if path.endswith(".npy"):
        img = np.load(path)
    elif path.endswith(".exr") and os.path.exists(path + ".npy"):
        img = np.load(path + ".npy")  # legacy no-EXR-codec fallback files
    elif path.endswith(".exr"):
        from .exr import read_exr

        try:
            img = read_exr(path)  # native scanline reader (NONE/ZIP/ZIPS)
        except ValueError:
            # exotic compression (PIZ etc.) — try cv2 if its codec exists
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED) if _EXR_ENABLED else None
            if img is not None and img.ndim == 3:
                img = img[..., ::-1]  # BGR -> RGB
    else:
        import imageio.v2 as imageio

        img = imageio.imread(path)
    if img is None:
        raise IOError(f"cannot read image: {path}")
    img = np.asarray(img)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    if grayscale and img.ndim == 3:
        img = img[..., :3] @ np.array([0.299, 0.587, 0.114], np.float32)
    return img


def write_image(path: str, img: np.ndarray) -> None:
    img = np.asarray(img)
    if path.endswith(".npy"):
        np.save(path, img.astype(np.float32))
        return
    if path.endswith(".exr"):
        from .exr import write_exr

        write_exr(path, img.astype(np.float32))
        return
    import imageio.v2 as imageio

    if img.dtype in (np.float32, np.float64):
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    imageio.imwrite(path, img)


def read_exif(path: str) -> dict:
    """Best-effort EXIF: make, model, focal length (mm), dimensions."""
    meta: dict = {}
    try:
        from PIL import Image, ExifTags

        with Image.open(path) as im:
            meta["width"], meta["height"] = im.size
            exif = im.getexif()
            if exif:
                tagmap = {ExifTags.TAGS.get(k, k): v for k, v in exif.items()}
                if "Make" in tagmap:
                    meta["make"] = str(tagmap["Make"]).strip()
                if "Model" in tagmap:
                    meta["model"] = str(tagmap["Model"]).strip()
                fl = tagmap.get("FocalLength")
                if fl is not None:
                    meta["focal_mm"] = float(fl)
    except Exception:
        if "width" not in meta:
            img = read_image(path)
            meta["height"], meta["width"] = img.shape[:2]
    return meta
