from .mesh import (make_mesh, replicated, batch_sharded, shard_batch,
                   shard_global_batch, plan_local_rows, LocalBatchPlan,
                   DATA_AXIS)
from .inference import make_sharded_chunked_inference
from .distributed import initialize, is_multi_host, local_batch_slice

__all__ = ["make_mesh", "replicated", "batch_sharded", "shard_batch",
           "shard_global_batch", "plan_local_rows", "LocalBatchPlan",
           "DATA_AXIS", "make_sharded_chunked_inference",
           "initialize", "is_multi_host", "local_batch_slice"]
