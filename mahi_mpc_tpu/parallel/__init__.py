from .mesh import (batch_spec, make_mesh, make_sharded_solver, scaling_report,
                   shard_params)
from .distributed import (global_batch_mesh, initialize_distributed,
                          make_global_array, scaling_table,
                          shard_params_global)
from .time_shard import solve_lqr_time_sharded

__all__ = [
    "make_mesh", "batch_spec", "shard_params", "make_sharded_solver",
    "scaling_report",
    "initialize_distributed", "global_batch_mesh", "make_global_array",
    "shard_params_global", "scaling_table",
    "solve_lqr_time_sharded",
]
