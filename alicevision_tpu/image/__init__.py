from . import cache, feeds, filtering, io, processing
from .cache import ImageCache

__all__ = ["ImageCache", "cache", "feeds", "filtering", "io", "processing"]
