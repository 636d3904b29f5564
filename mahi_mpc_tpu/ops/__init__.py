from .linalg import (chol_lanes, chol_small, cho_solve_lanes, cho_solve_small,
                     register_lapack_ffi_targets, solve_small,
                     spd_solve_lanes, spd_solve_small, tri_solve_lower,
                     tri_solve_upper_t)

__all__ = [
    "chol_small", "cho_solve_small", "spd_solve_small", "solve_small",
    "tri_solve_lower", "tri_solve_upper_t", "register_lapack_ffi_targets",
    "chol_lanes", "cho_solve_lanes", "spd_solve_lanes",
]
