"""Import-path parity shim for `minimagen.layers` (reference layers.py)."""
from .models.layers import (  # noqa: F401
    Attention,
    Block,
    ChanFeedForward,
    ChanLayerNorm,
    CrossAttention,
    CrossEmbedLayer,
    Downsample,
    GroupNorm,
    LayerNorm,
    ParallelSum,
    ResnetBlock,
    TransformerBlock,
    Upsample,
    sinusoidal_pos_emb,
)
