"""Pallas TPU kernels and pure-JAX compute ops."""

from motion324_tpu.ops.attention import multi_head_attention, mha_reference  # noqa: F401
from motion324_tpu.ops.embeddings import (  # noqa: F401
    frequency_embed,
    point_embed_basis,
    video_pos_embed,
    resize_pos_embed,
)
