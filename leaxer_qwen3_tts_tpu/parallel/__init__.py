"""Device mesh + SPMD sharding (data/tensor parallelism over ICI)."""

from .mesh import (
    TP_RULES,
    auto_mesh,
    data_sharding,
    make_mesh,
    param_pspec,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "make_mesh",
    "auto_mesh",
    "param_shardings",
    "shard_params",
    "param_pspec",
    "data_sharding",
    "replicated",
    "TP_RULES",
]
