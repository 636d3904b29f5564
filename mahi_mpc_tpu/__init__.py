"""mahi_mpc_tpu — a TPU-native nonlinear MPC / trajectory-optimization engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
mahilab/mahi-mpc (see SURVEY.md): user dynamics as pure JAX functions,
direct multiple-shooting transcription, a batched structured SQP whose
stage-banded KKT systems are solved by Riccati recursion (lax.scan, Pallas
kernel, or parallel-in-time associative scan), and a warm-started
receding-horizon runtime with an asynchronous plan service.
"""

import jax as _jax

# TPU MXU matmuls default to bfloat16 inputs; Newton/Riccati directions
# computed at bf16 stall the SQP far from tolerance (observed: 28% vs 100%
# convergence TPU-vs-CPU on identical programs).  An optimization library
# needs true fp32 contractions; the flops cost is irrelevant at our matrix
# sizes (bandwidth-bound).
_jax.config.update("jax_default_matmul_precision", "highest")

from .params import ModelParameters, SolverOptions, TrajectoryParameters
from . import models

__version__ = "0.1.0"

__all__ = [
    "ModelParameters",
    "SolverOptions",
    "TrajectoryParameters",
    "models",
]
