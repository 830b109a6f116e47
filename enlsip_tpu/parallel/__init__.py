from .batch import BatchResult, init_batch, run_batch, solve_batched
from .sharding import batch_mesh, solve_batched_sharded

__all__ = ["BatchResult", "init_batch", "run_batch", "solve_batched",
           "batch_mesh", "solve_batched_sharded"]
