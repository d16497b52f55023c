from .metrics import (
    frechet_distance,
    polynomial_kernel,
    polynomial_mmd,
    preprocess_videos_for_i3d,
    trace_sqrt_product,
)
from .evaluator import eval_multimodal
from .audio_embed import LogMelEmbedder

__all__ = [
    "frechet_distance",
    "polynomial_kernel",
    "polynomial_mmd",
    "preprocess_videos_for_i3d",
    "trace_sqrt_product",
    "eval_multimodal",
    "LogMelEmbedder",
]
