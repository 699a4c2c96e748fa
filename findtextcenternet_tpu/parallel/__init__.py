from .mesh import (  # noqa: F401
    make_mesh,
    param_pspec,
    replicate,
    shard_batch,
    shard_params,
)
