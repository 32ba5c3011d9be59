"""Device-mesh parallelism: sharding is an annotation, not a rewrite."""

from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    shard_params,
)
from .pipeline import (  # noqa: F401
    PipelinedViT,
    make_pipeline_mesh,
    make_pipelined_train_step,
)
from .sequence import (  # noqa: F401
    make_seq_mesh,
    ring_attention,
)
from .expert import (  # noqa: F401
    MoEFeedForward,
    make_expert_mesh,
)
