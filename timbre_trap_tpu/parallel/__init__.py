from .mesh import make_mesh, replicated, batch_sharded, shard_batch, DATA_AXIS

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch", "DATA_AXIS"]
