from .sharded import (
    HaloDIAOperator,
    RowShardedELLOperator,
    replicate,
    row_mesh,
    shard_dia,
    shard_ell,
    shard_vector,
)

__all__ = [
    "HaloDIAOperator",
    "RowShardedELLOperator",
    "replicate",
    "row_mesh",
    "shard_dia",
    "shard_ell",
    "shard_vector",
]
