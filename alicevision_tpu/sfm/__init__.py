from . import alignment, ba, statistics
from .ba import BAProblem, BAResult, ba_solve, build_problem, pose_covariances, refine_intrinsics
from .expansion import ExpansionProcess
from .global_sfm import (
    GlobalSfM,
    rotation_averaging_l1,
    rotation_averaging_l2,
    translation_averaging_l1soft,
    translation_averaging_l2,
)
from .incremental import IncrementalConfig, IncrementalSfM
from .rotation_sfm import RotationSfM, robust_rotation

__all__ = [
    "BAProblem",
    "BAResult",
    "ExpansionProcess",
    "GlobalSfM",
    "IncrementalConfig",
    "IncrementalSfM",
    "RotationSfM",
    "alignment",
    "ba",
    "ba_solve",
    "build_problem",
    "pose_covariances",
    "refine_intrinsics",
    "robust_rotation",
    "rotation_averaging_l1",
    "rotation_averaging_l2",
    "statistics",
    "translation_averaging_l1soft",
    "translation_averaging_l2",
]
