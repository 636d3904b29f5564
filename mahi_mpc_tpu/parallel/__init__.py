from .mesh import (batch_spec, make_mesh, make_sharded_solver, scaling_report,
                   shard_params)

__all__ = [
    "make_mesh", "batch_spec", "shard_params", "make_sharded_solver",
    "scaling_report",
]
