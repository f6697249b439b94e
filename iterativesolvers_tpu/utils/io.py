"""Matrix I/O — MatrixMarket loader.

The reference's benchmark suite loads NIST/SuiteSparse matrices through
MatrixMarket.jl (benchmark/matrixmarket.jl:1-32, benchmark/setup-florida.jl).
Here the parse runs in the native layer (itsolvers_native.cpp, ctypes) with
a pure-Python fallback.
"""

from __future__ import annotations

import numpy as np

from ..native import mm_read
from ..operators.sparse import CSRMatrix

__all__ = ["load_matrix_market"]


def load_matrix_market(path: str, dtype=np.float64) -> CSRMatrix:
    """Read a MatrixMarket coordinate file into a CSRMatrix
    (real/integer/pattern fields; general/symmetric/skew symmetries)."""
    shape, rows, cols, vals = mm_read(path)
    return CSRMatrix.from_coo(rows, cols, vals.astype(dtype), shape)
