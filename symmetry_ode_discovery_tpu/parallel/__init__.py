from .mesh import make_mesh, shard_sweep

__all__ = ["make_mesh", "shard_sweep"]
