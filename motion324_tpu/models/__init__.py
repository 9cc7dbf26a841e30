"""Network definitions (flax.linen modules over the Pallas/XLA ops)."""

from motion324_tpu.models.transformer import (  # noqa: F401
    RMSNorm,
    MLP,
    SelfAttention,
    CrossAttention,
    TransformerBlock,
    CrossAttentionBlock,
)
from motion324_tpu.models.motion_model import MotionLatentModel  # noqa: F401
