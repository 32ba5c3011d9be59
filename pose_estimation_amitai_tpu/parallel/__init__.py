"""Device-mesh parallelism: sharding is an annotation, not a rewrite."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
