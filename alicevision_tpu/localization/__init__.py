from .localizer import LocalizationResult, build_landmark_index, localize_image
from .marker_localizer import (
    SequenceRefineResult,
    localize_by_markers,
    localize_image_by_markers,
    refine_sequence,
)

__all__ = [
    "LocalizationResult",
    "SequenceRefineResult",
    "build_landmark_index",
    "localize_by_markers",
    "localize_image",
    "localize_image_by_markers",
    "refine_sequence",
]
