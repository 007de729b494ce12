"""Mesh construction and sharding rules — the framework's distributed
communication layer (jax.sharding + pjit over ICI; the reference has no
distributed component at all, SURVEY.md §5)."""

from vlm_bridge_tpu.parallel.distributed import (  # noqa: F401
    init_multihost,
    process_info,
)
from vlm_bridge_tpu.parallel.sharding import (  # noqa: F401
    auto_mesh,
    batch_sharding,
    param_shardings,
    replicate,
    shard_batch,
    shard_params,
)
