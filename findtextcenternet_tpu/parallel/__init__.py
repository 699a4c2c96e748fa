from .mesh import (  # noqa: F401
    leaf_sharding,
    make_mesh,
    param_pspec,
    replicate,
    shard_batch,
    shard_params,
    state_shardings,
    tree_pspecs,
)
