from .plan import Plan, empty_plan
from .generate import ModelGenerator, generate_model
from .control import ModelControl, SolveStats

__all__ = [
    "Plan", "empty_plan",
    "ModelGenerator", "generate_model",
    "ModelControl", "SolveStats",
]
