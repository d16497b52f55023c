from .metrics import (
    frechet_distance,
    polynomial_kernel,
    polynomial_mmd,
    precision_recall,
    preprocess_videos_for_i3d,
    trace_sqrt_product,
)
from .evaluator import eval_multimodal
from .image_eval import eval_images
from .audio_embed import LogMelEmbedder

__all__ = [
    "frechet_distance",
    "polynomial_kernel",
    "polynomial_mmd",
    "precision_recall",
    "preprocess_videos_for_i3d",
    "trace_sqrt_product",
    "eval_multimodal",
    "eval_images",
    "LogMelEmbedder",
]
