"""Pure-functional grounding ops (jax.numpy reference path).

Every op here is shape-static, mask-driven, and jit/vmap/shard_map-safe. The
Pallas kernels in `nafae_tpu/ops/pallas/` are verified against these functions.
Math spec: docs/MATH.md.
"""

from nafae_tpu.ops.grounding import (  # noqa: F401
    l2_normalize,
    embed_words,
    project_regions,
    similarity_tensor,
    frame_mil_max,
    frame_attention,
    video_scores,
    cross_scores,
    region_affinity,
    context_similarity,
    ground_forward,
)
from nafae_tpu.ops.losses import (  # noqa: F401
    ranking_loss,
    context_loss,
    select_top_regions,
    cluster_loss,
)
from nafae_tpu.ops.kmeans import kmeans_assign, kmeans_lloyd  # noqa: F401
from nafae_tpu.ops.iou import box_iou  # noqa: F401
