from .layers import (
    AudioConv,
    GroupNormFP32,
    TimeEmbedding,
    VideoConv,
    timestep_embedding,
)
from .attention import (
    FactorizedVideoAttention,
    RSMMACrossAttention,
    TokenSelfAttention,
    qkv_attention,
    window_frame_indices,
)
from .mm_unet import MMUNetConfig, MultimodalUNet, build_plan

__all__ = [
    "AudioConv",
    "GroupNormFP32",
    "TimeEmbedding",
    "VideoConv",
    "timestep_embedding",
    "FactorizedVideoAttention",
    "RSMMACrossAttention",
    "TokenSelfAttention",
    "qkv_attention",
    "window_frame_indices",
    "MMUNetConfig",
    "MultimodalUNet",
    "build_plan",
]
