from .stage_qp import StageQP, build_stage_qp
from .riccati import LQRSolution, register_backend, solve_lqr
from .sqp import CONVERGED, DIVERGED, MAX_ITER, SolveResult, solve, solve_batch

__all__ = [
    "StageQP", "build_stage_qp",
    "LQRSolution", "solve_lqr", "register_backend",
    "SolveResult", "solve", "solve_batch",
    "CONVERGED", "MAX_ITER", "DIVERGED",
]
