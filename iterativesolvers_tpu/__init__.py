"""iterativesolvers_tpu — a TPU-native Krylov iterative-solver framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
IterativeSolvers.jl (reference: /root/reference, v0.9.4).  Solvers are pure
functions compiling to single XLA programs (``lax.while_loop`` drivers), with
sparse formats and kernels designed for TPU (DIA/ELL/BSR row layouts, fused
reduction bundles, sharded row-partitioned operators over a device mesh).
"""

from .operators.linear_operator import (
    AdjointOperator,
    FunctionOperator,
    LinearOperator,
    MatrixOperator,
    as_operator,
)
from .operators.preconditioners import (
    DensePreconditioner,
    DiagonalPreconditioner,
    EisenstatSSOROperator,
    FunctionPreconditioner,
    ICPreconditioner,
    ILUPreconditioner,
    IdentityPreconditioner,
    Preconditioner,
    RedBlackICPreconditioner,
    as_preconditioner,
)
from .operators.rb_reduce import RBReducedSystem
from .operators.stencil import (
    GradientOperator,
    StencilOperator,
    advection_diffusion_stencil,
    laplacian,
)
from .operators.sparse import (
    BSRMatrix,
    CSRMatrix,
    DIAMatrix,
    ELLMatrix,
    HYBMatrix,
    compress_values,
    csr_from_dense,
    dia_from_dense,
    values_representable,
)
from .solvers.bicgstabl import bicgstabl, bicgstabl_iterator
from .solvers.block_cg import block_cg, block_cg_iterator
from .solvers.cg import cg, cg_iterator
from .solvers.chebyshev import chebyshev, chebyshev_iterator
from .solvers.gmres import gmres, gmres_iterator
from .solvers.idrs import idrs, idrs_iterator
from .solvers.minres import minres, minres_iterator
from .solvers.pipelined import pipelined_cg
from .solvers.lobpcg import LOBPCGResults, lobpcg, lobpcg_iterator
from .solvers.lsmr import lsmr
from .solvers.lsqr import lsqr
from .solvers.qmr import qmr, qmr_iterator
from .solvers.simple import invpowm, powm, powm_iterator
from .solvers.svdl import svdl, svdl_iterator
from .solvers.stationary import (
    SingularError,
    gauss_seidel,
    gauss_seidel_iterable,
    jacobi,
    jacobi_iterable,
    sor,
    sor_iterable,
    ssor,
    ssor_iterable,
)
from .ops.givens import givens
from .ops.hessenberg import hessenberg_lstsq
from .ops.orthogonalize import ORTH_METHODS, orthogonalize_and_normalize
from .ops.triangular import LevelScheduledTriangular
from .utils.dtypes import zerox
from .utils.history import ConvergenceHistory
from .utils.io import load_matrix_market
from .utils.spectral import gershgorin_bounds, power_bound

__version__ = "0.1.0"
