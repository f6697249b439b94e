from .sharded import (
    HaloDIAOperator,
    replicate,
    row_mesh,
    shard_dia,
    shard_vector,
)

__all__ = [
    "HaloDIAOperator",
    "replicate",
    "row_mesh",
    "shard_dia",
    "shard_vector",
]
