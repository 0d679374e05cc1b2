from .ransac import (
    ACRansacSelection,
    acransac_select,
    lmeds_select,
    log10_choose,
    logalpha0_line,
    logalpha0_point,
    sample_minimal,
    simple_select,
)
from .estimators import (
    RobustModel,
    RobustPose,
    robust_essential,
    robust_fundamental,
    robust_homography,
    robust_relative_pose,
    robust_resection_p3p,
)

__all__ = [
    "ACRansacSelection",
    "RobustModel",
    "RobustPose",
    "acransac_select",
    "lmeds_select",
    "log10_choose",
    "logalpha0_line",
    "logalpha0_point",
    "robust_essential",
    "robust_fundamental",
    "robust_homography",
    "robust_relative_pose",
    "robust_resection_p3p",
    "sample_minimal",
    "simple_select",
]
