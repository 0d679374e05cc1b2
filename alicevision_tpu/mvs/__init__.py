from .plane_sweep import (
    SgmParams,
    inverse_depth_planes,
    retrieve_best_depth,
    sgm_aggregate,
    sgm_depth_map,
    similarity_volume,
)
from .rectified import (
    rectification_ok,
    similarity_volume_auto,
    similarity_volume_rectified,
)
from .refine import color_guided_optimize, refine_depth_map
from .fusion import (
    consistency_filter,
    consistency_filter_ring,
    depth_range_from_landmarks,
    fuse_point_cloud,
)
from .sharded import batched_sgm, make_sharded_sgm, sgm_depth_map_tiled

__all__ = [
    "SgmParams",
    "batched_sgm",
    "color_guided_optimize",
    "consistency_filter",
    "consistency_filter_ring",
    "depth_range_from_landmarks",
    "fuse_point_cloud",
    "inverse_depth_planes",
    "make_sharded_sgm",
    "rectification_ok",
    "refine_depth_map",
    "retrieve_best_depth",
    "similarity_volume_auto",
    "similarity_volume_rectified",
    "sgm_aggregate",
    "sgm_depth_map",
    "sgm_depth_map_tiled",
    "similarity_volume",
]
