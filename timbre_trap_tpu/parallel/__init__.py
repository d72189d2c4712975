from .mesh import make_mesh, replicated, batch_sharded, shard_batch, DATA_AXIS
from .inference import make_sharded_chunked_inference

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch",
           "DATA_AXIS", "make_sharded_chunked_inference"]
