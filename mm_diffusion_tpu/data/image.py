"""Image datasets: plain folders and SR training pairs with degradations.

Re-design of `mm_diffusion/image_datasets.py` (resize-pad folder dataset) and
`mm_diffusion/real_image_datasets.py` (SR pairs with gaussian-noise + JPEG
-artifact augmentation, :133-159) for the host side of a TPU pipeline.
Channels-last float32 in [-1,1].
"""

from __future__ import annotations

import os
import random
from typing import Dict, Iterator, List, Tuple

import numpy as np

try:
    import cv2  # type: ignore

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".webp", ".bmp")


def list_image_files(data_dir: str) -> List[str]:
    """(parity: _list_image_files_recursively, image_datasets.py)"""
    out = []
    for root, _dirs, files in os.walk(data_dir):
        for f in sorted(files):
            if f.lower().endswith(IMAGE_EXTS):
                out.append(os.path.join(root, f))
    return sorted(out)


def resize_pad_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Aspect-preserving resize + center pad (parity: image_datasets.py
    resize-pad transform)."""
    h, w = img.shape[:2]
    ratio = min(out_h / h, out_w / w)
    nh, nw = int(h * ratio), int(w * ratio)
    resized = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
    out = np.zeros((out_h, out_w, img.shape[2]), resized.dtype)
    top, left = (out_h - nh) // 2, (out_w - nw) // 2
    out[top : top + nh, left : left + nw] = resized
    return out


def degrade_lr(
    hr: np.ndarray,
    small_size: int,
    rng: random.Random,
    noise_std_range: Tuple[float, float] = (0.0, 0.06),
    jpeg_quality_range: Tuple[int, int] = (40, 95),
    apply_noise: bool = True,
    apply_jpeg: bool = True,
) -> np.ndarray:
    """Bicubic downsample + gaussian noise + JPEG artifacts
    (parity: real_image_datasets.py:133-159 degradation pipeline).

    ``hr`` is uint8 HWC; returns float32 [-1,1] LR image.
    """
    lr = cv2.resize(hr, (small_size, small_size), interpolation=cv2.INTER_CUBIC)
    if apply_jpeg:
        q = rng.randint(*jpeg_quality_range)
        ok, enc = cv2.imencode(".jpg", lr, [int(cv2.IMWRITE_JPEG_QUALITY), q])
        if ok:
            lr = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    lr = lr.astype(np.float32) / 127.5 - 1.0
    if apply_noise:
        std = rng.uniform(*noise_std_range)
        lr = lr + np.random.RandomState(rng.randint(0, 2**31)).randn(*lr.shape).astype(
            np.float32
        ) * std
    return np.clip(lr, -1.0, 1.0)


def load_image_data(
    *,
    data_dir: str,
    batch_size: int,
    image_size: int,
    random_flip: bool = True,
    shard: int = 0,
    num_shards: int = 1,
    seed: int = 0,
) -> Iterator[np.ndarray]:
    """Infinite image-batch generator (parity surface: image_datasets.load_data)."""
    files = list_image_files(data_dir)[shard::num_shards]
    assert files, f"no images under {data_dir}"
    rng = random.Random(seed + shard)
    while True:
        batch = []
        for _ in range(batch_size):
            img = cv2.imread(rng.choice(files))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = resize_pad_image(img, image_size, image_size)
            x = img.astype(np.float32) / 127.5 - 1.0
            if random_flip and rng.random() < 0.5:
                x = x[:, ::-1].copy()
            batch.append(x)
        yield np.stack(batch)


def load_sr_data(
    *,
    data_dir: str,
    batch_size: int,
    large_size: int,
    small_size: int,
    degrade: bool = True,
    random_flip: bool = True,
    shard: int = 0,
    num_shards: int = 1,
    seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """SR training pairs (hr, lr[, sr_bicubic]) with optional degradations
    (parity surface: real_image_datasets.RealImageDataset.__getitem__,
    real_image_datasets.py:161-229)."""
    files = list_image_files(data_dir)[shard::num_shards]
    assert files, f"no images under {data_dir}"
    rng = random.Random(seed + shard)
    while True:
        hrs, lrs, srs = [], [], []
        for _ in range(batch_size):
            img = cv2.imread(rng.choice(files))
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            img = resize_pad_image(img, large_size, large_size)
            if random_flip and rng.random() < 0.5:
                img = img[:, ::-1].copy()
            if degrade:
                lr = degrade_lr(img, small_size, rng)
            else:
                lr = (
                    cv2.resize(img, (small_size, small_size), cv2.INTER_CUBIC).astype(
                        np.float32
                    )
                    / 127.5
                    - 1.0
                )
            # bicubic re-upsample of the LR (the reference's `sr` channel,
            # real_image_datasets.py:161 return tuple)
            sr_b = cv2.resize(
                ((lr + 1) * 127.5).astype(np.uint8), (large_size, large_size),
                interpolation=cv2.INTER_CUBIC,
            ).astype(np.float32) / 127.5 - 1.0
            hrs.append(img.astype(np.float32) / 127.5 - 1.0)
            lrs.append(lr)
            srs.append(sr_b)
        yield {
            "high_res": np.stack(hrs),
            "low_res": np.stack(lrs),
            "sr_bicubic": np.stack(srs),
        }
