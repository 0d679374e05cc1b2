from .color_harmonization import harmonize_gains
from .masking import hsv_mask, threshold_mask
from .rig import calibrate_rig

__all__ = ["calibrate_rig", "harmonize_gains", "hsv_mask", "threshold_mask"]
