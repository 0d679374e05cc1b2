from .triangulation import (
    depths,
    reprojection_errors,
    triangulate_dlt,
    triangulate_midpoint,
    triangulate_nview,
)
from .epipolar import (
    decompose_essential,
    epipolar_distance_sq,
    essential_8pt,
    essential_from_F,
    fundamental_7pt,
    fundamental_8pt,
    homography_4pt,
    homography_error_sq,
    normalize_points,
    relative_pose_from_essential,
    select_cheirality,
)
from .five_point import essential_5pt
from .resection import epnp, gauss_newton_pose_refine, kabsch, p3p, resection_dlt6

__all__ = [
    "decompose_essential",
    "depths",
    "epipolar_distance_sq",
    "epnp",
    "resection_dlt6",
    "essential_5pt",
    "essential_8pt",
    "essential_from_F",
    "fundamental_7pt",
    "fundamental_8pt",
    "gauss_newton_pose_refine",
    "homography_4pt",
    "homography_error_sq",
    "kabsch",
    "normalize_points",
    "p3p",
    "relative_pose_from_essential",
    "reprojection_errors",
    "select_cheirality",
    "triangulate_dlt",
    "triangulate_midpoint",
    "triangulate_nview",
]
