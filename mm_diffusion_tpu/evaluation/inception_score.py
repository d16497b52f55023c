"""Inception Score for video/image sample sets.

Capability parity for the reference's standalone IS scripts
(`evaluations/compute_video_is.py` — chainer C3D, legacy — and
`evaluations/compute_image_is.py` — TF1 InceptionV3).  The score math is
model-agnostic: IS = exp(E_x[ KL(p(y|x) || p(y)) ]), computed over softmax
class posteriors from any classifier (here: the flax I3D's 400-way logits
for video, making this a TPU-native "video IS" without the chainer/TF1
dependencies).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def inception_score(
    logits: np.ndarray, splits: int = 10, rng_seed: Optional[int] = None
) -> Tuple[float, float]:
    """IS mean/std over ``splits`` chunks (standard protocol).

    ``logits``: [N, C] classifier logits (pre-softmax).
    """
    logits = np.asarray(logits, np.float64)
    if rng_seed is not None:
        logits = logits[np.random.RandomState(rng_seed).permutation(len(logits))]
    # stable softmax
    z = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(z)
    probs /= probs.sum(axis=1, keepdims=True)

    scores = []
    n = len(probs)
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-12) - np.log(marginal + 1e-12))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))
