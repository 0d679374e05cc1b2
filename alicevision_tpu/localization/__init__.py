from .localizer import LocalizationResult, build_landmark_index, localize_image

__all__ = ["LocalizationResult", "build_landmark_index", "localize_image"]
