from . import io
from .sift import SiftConfig, SiftFeatures, extract as extract_sift, quantize_desc
from .akaze import AkazeConfig, extract as extract_akaze

__all__ = [
    "AkazeConfig",
    "SiftConfig",
    "SiftFeatures",
    "extract_akaze",
    "extract_sift",
    "io",
    "quantize_desc",
]
