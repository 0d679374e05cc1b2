from .delaunay_graphcut import graph_cut_surface, tetrahedralize
from .ops import (
    compact,
    decimate_grid,
    laplacian_smooth,
    largest_component,
    load_obj,
    save_obj,
    vertex_normals,
)
from .texturing import bake_vertex_colors

__all__ = [
    "bake_vertex_colors",
    "compact",
    "decimate_grid",
    "graph_cut_surface",
    "laplacian_smooth",
    "largest_component",
    "load_obj",
    "save_obj",
    "tetrahedralize",
    "vertex_normals",
]
