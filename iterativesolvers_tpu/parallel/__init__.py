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
    "replicate",
    "row_mesh",
    "shard_dia",
    "shard_ell",
    "shard_vector",
    "slice_mesh",
]
