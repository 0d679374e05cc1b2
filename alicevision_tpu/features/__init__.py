from . import io
from .sift import SiftConfig, SiftFeatures, extract as extract_sift, quantize_desc
from .akaze import AkazeConfig, extract as extract_akaze
from .markers import (
    MarkerDetection,
    detect_apriltags,
    detect_cctags,
    markers_to_features,
    render_apriltag,
    render_cctag,
)

__all__ = [
    "AkazeConfig",
    "MarkerDetection",
    "detect_apriltags",
    "detect_cctags",
    "markers_to_features",
    "render_apriltag",
    "render_cctag",
    "SiftConfig",
    "SiftFeatures",
    "extract_akaze",
    "extract_sift",
    "io",
    "quantize_desc",
]
