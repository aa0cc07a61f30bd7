from .mesh import make_mesh, shard_paths

__all__ = ["make_mesh", "shard_paths"]
