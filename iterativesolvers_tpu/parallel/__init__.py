from .panel_ortho import (
    dist_panel_ortho,
    panel_layout,
    panel_row_to_vec,
    vec_to_panel_row,
)
from .precond import ShardedBlockJacobiPreconditioner
from .sharded import (
    HaloDIAOperator,
    HaloStencilOperator,
    RowShardedELLOperator,
    replicate,
    row_mesh,
    shard_dia,
    shard_ell,
    shard_vector,
    slice_mesh,
)

__all__ = [
    "HaloDIAOperator",
    "HaloStencilOperator",
    "RowShardedELLOperator",
    "ShardedBlockJacobiPreconditioner",
    "dist_panel_ortho",
    "panel_layout",
    "panel_row_to_vec",
    "replicate",
    "row_mesh",
    "shard_dia",
    "shard_ell",
    "shard_vector",
    "slice_mesh",
    "vec_to_panel_row",
]
