"""Model stack: fusion layers, losses, and the multimodal recommender."""
from .layers import (  # noqa: F401
    AttentionFusionLayer,
    CrossModalAttention,
    GatedFusionLayer,
)
from .losses import contrastive_loss, l2_normalize, recommender_loss  # noqa: F401
from .end_to_end import (  # noqa: F401
    EndToEndRecommender,
    build_end_to_end_model,
    trainable_mask,
)
from .multimodal import (  # noqa: F401
    MultimodalRecommender,
    PretrainedMultimodalRecommender,
    build_model,
)
