"""Type utilities.

TPU-native analogue of the reference's ``src/common.jl``:
  * ``solve_dtype``   ~ ``Adivtype`` (src/common.jl:11): the element type of
    ``one(eltype(b)) / one(eltype(A))``.
  * ``zerox``         ~ ``zerox`` (src/common.jl:18-23): a zero-initialized
    solution vector of the promoted type.

On TPU, float64 is emulated and slow; we never silently upcast.  The promoted
type is the JAX result-type of the operands, so f32 problems stay f32.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def solve_dtype(a_dtype, b_dtype) -> np.dtype:
    """dtype of ``b / A`` — the natural dtype for the solution iterates."""
    return jnp.result_type(jnp.dtype(a_dtype), jnp.dtype(b_dtype))


def real_dtype(dtype) -> np.dtype:
    """Real counterpart of a (possibly complex) dtype — used for norms/tols."""
    return np.zeros((), dtype=dtype).real.dtype


def zerox(A, b):
    """Zero initial guess with the promoted solve dtype (src/common.jl:18-23)."""
    return jnp.zeros(b.shape, dtype=solve_dtype(A.dtype, b.dtype))


def default_reltol(dtype) -> float:
    """``sqrt(eps(real(T)))`` — the reference's default reltol (src/cg.jl:121)."""
    return float(np.sqrt(np.finfo(real_dtype(dtype)).eps))


def eps(dtype) -> float:
    return float(np.finfo(real_dtype(dtype)).eps)
