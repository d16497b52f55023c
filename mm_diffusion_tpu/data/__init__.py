from .synthetic import load_synthetic_data, synthetic_av_pair
from . import media

__all__ = ["load_synthetic_data", "synthetic_av_pair", "media"]
