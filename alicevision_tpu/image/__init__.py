from . import feeds, filtering, io, processing

__all__ = ["feeds", "filtering", "io", "processing"]
