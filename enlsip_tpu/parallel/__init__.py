from .batch import BatchResult, init_batch, run_batch, solve_batched
from .rowsharded import row_mesh, solve_rowsharded
from .sharding import batch_mesh, solve_batched_sharded

__all__ = ["BatchResult", "init_batch", "run_batch", "solve_batched",
           "batch_mesh", "solve_batched_sharded", "row_mesh",
           "solve_rowsharded"]
