from .index import ClusterTileIndexSpark  # noqa: F401
