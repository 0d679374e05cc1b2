from .mesh import make_mesh, replicated, shard_leading
from .ba_sharded import make_sharded_ba, shard_problem, solve_sharded
from .distributed import host_local_view_range, init_distributed, is_primary

__all__ = [
    "host_local_view_range",
    "init_distributed",
    "is_primary",
    "make_mesh",
    "make_sharded_ba",
    "replicated",
    "shard_leading",
    "shard_problem",
    "solve_sharded",
]
