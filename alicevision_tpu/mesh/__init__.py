from .clean import boundary_loops, clean_mesh, fill_small_holes
from .delaunay_graphcut import graph_cut_surface, tetrahedralize
from .denoise import denoise_sd, mask_faces_by_views, resample
from .lscm import conformal_error, lscm_unwrap
from .ops import (
    compact,
    decimate_grid,
    decimate_qem,
    laplacian_smooth,
    largest_component,
    load_obj,
    save_obj,
    vertex_normals,
)
from .texturing import bake_vertex_colors

__all__ = [
    "bake_vertex_colors",
    "boundary_loops",
    "clean_mesh",
    "fill_small_holes",
    "compact",
    "conformal_error",
    "lscm_unwrap",
    "decimate_grid",
    "decimate_qem",
    "denoise_sd",
    "graph_cut_surface",
    "laplacian_smooth",
    "largest_component",
    "load_obj",
    "mask_faces_by_views",
    "resample",
    "save_obj",
    "tetrahedralize",
    "vertex_normals",
]
