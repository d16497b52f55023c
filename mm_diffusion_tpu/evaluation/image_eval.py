"""Image-set evaluation: IS / FID / sFID / KID / improved precision & recall.

Covers the reference's TF1 npz evaluator
(`evaluations/compute_image_is.py`): same input formats (an ``.npz`` batch
with ``arr_0`` uint8 ``[N, H, W, 3]``, or a directory of image files), and
— since r5 — the same metrics under TWO protocols:

* **Exact legacy protocol** (``inception_pb=classify_image_graph_def.pb``):
  the frozen TF1 InceptionV3 graph itself is executed with jax ops
  (`evaluation/graphdef.py`), reproducing the OpenAI evaluator's tensor
  contract (`evaluator.py:120-195,586-614`): Inception-IS from the biasless
  softmax head, Inception-FID on pool_3, sFID on mixed_6/conv[...,:7] —
  numbers comparable to published tables.  The user downloads the ``.pb``
  once (this environment has no egress).
* **CLIP protocol** (``clip_checkpoint``): the ported CLIP visual ResNet
  (`evaluation/clip_model.py`) embeds instead — **CLIP-FID** (Kynkaanniemi
  et al. 2022), self-consistent but NOT comparable to Inception tables.
  Inception-IS/sFID are classifier-graph-specific and not computed here.
* precision/recall are embedding-space-generic and match the reference's
  manifold algorithm exactly (compute_image_is.py:195-351, nhood_size=3).

Fallback (``allow_fallback=True``, no checkpoint): pixel-statistics
embeddings — relative comparisons only, tagged ``protocol="fallback"``.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional

import numpy as np

from ..utils import logger
from .metrics import frechet_distance, polynomial_mmd, precision_recall

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def list_image_files(path: str) -> List[str]:
    out = []
    for root, _, names in os.walk(path):
        out.extend(
            os.path.join(root, n) for n in names if n.lower().endswith(IMAGE_EXTS)
        )
    return sorted(out)


def load_image_batch(path: str, limit: Optional[int] = None) -> np.ndarray:
    """``.npz``/``.npy`` batch (reference format: uint8 ``arr_0``) or a
    directory of images -> uint8 ``[N, H, W, 3]``."""
    if os.path.isdir(path):
        files = list_image_files(path)
        if not files:
            raise FileNotFoundError(f"no images under {path}")
        if limit:
            files = files[:limit]
        from PIL import Image

        imgs = [np.asarray(Image.open(f).convert("RGB"), np.uint8) for f in files]
        shapes = {im.shape for im in imgs}
        if len(shapes) != 1:
            raise ValueError(f"mixed image shapes under {path}: {sorted(shapes)}")
        return np.stack(imgs)
    if path.endswith(".npy"):
        arr = np.load(path)
    else:
        with np.load(path) as z:
            key = "arr_0" if "arr_0" in z else list(z.keys())[0]
            arr = z[key]
    if arr.ndim == 5 and arr.shape[-1] == 3:
        # AV/video batch (evaluation/npz_batch.py): evaluate all frames as
        # an image set [N*F, H, W, 3]
        arr = arr.reshape(-1, *arr.shape[2:])
    if arr.ndim != 4 or arr.shape[-1] != 3:
        raise ValueError(f"{path}: expected [N,H,W,3] uint8, got {arr.shape}")
    return arr[:limit].astype(np.uint8) if limit else arr.astype(np.uint8)


def make_clip_image_embedder(checkpoint: Optional[str]) -> Optional[Callable]:
    """Jitted CLIP-visual image embedder from an AudioCLIP-full or OpenAI
    CLIP checkpoint (both store the tower under ``visual.``); None when the
    checkpoint is absent."""
    if not checkpoint or not os.path.exists(checkpoint):
        return None
    import jax
    import jax.numpy as jnp
    import torch

    from .clip_model import (
        CLIPVisualResNet,
        convert_clip_visual,
        preprocess_frames_for_clip,
    )

    sd = torch.load(checkpoint, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if hasattr(sd, "state_dict"):  # jit-scripted CLIP archives
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    variables = convert_clip_visual(sd, prefix="visual.")
    model = CLIPVisualResNet()
    apply = jax.jit(lambda v: model.apply(variables, v))

    def embed(images_uint8: np.ndarray) -> np.ndarray:
        pre = preprocess_frames_for_clip(images_uint8[:, None])[:, 0]
        return np.asarray(jax.device_get(apply(jnp.asarray(pre))))

    return embed


def _pixel_fallback_embed(images_uint8: np.ndarray) -> np.ndarray:
    x = images_uint8.astype(np.float32) / 255.0
    n = x.shape[0]
    # channel means/stds + coarse 4x4 spatial pooling: enough structure for
    # relative comparisons, explicitly NOT a perceptual space
    flat = x.reshape(n, -1, 3)
    h, w = x.shape[1], x.shape[2]
    gh, gw = max(h // 4, 1), max(w // 4, 1)
    pooled = x[:, : gh * 4, : gw * 4].reshape(n, 4, gh, 4, gw, 3).mean((2, 4))
    return np.concatenate(
        [flat.mean(1), flat.std(1), pooled.reshape(n, -1)], axis=-1
    )


def eval_images(
    ref_path: str,
    sample_path: str,
    clip_checkpoint: Optional[str] = None,
    eval_num: Optional[int] = None,
    batch_size: int = 64,
    nhood_size: int = 3,
    allow_fallback: bool = True,
    inception_pb: Optional[str] = None,
) -> Dict[str, float]:
    """FID / KID / precision / recall between two image sets
    (parity surface: evaluations/compute_image_is.py:27-66).

    With ``inception_pb`` = the published ``classify_image_graph_def.pb``,
    the EXACT legacy protocol runs instead: the frozen TF1 InceptionV3 graph
    executes under jax (evaluation/graphdef.py), producing Inception-IS,
    Inception-FID, and sFID comparable to published tables
    (evaluator.py:586-614 tensor contract)."""
    log = logger.get_current()
    if inception_pb:
        return _eval_images_inception(
            ref_path, sample_path, inception_pb, eval_num, batch_size, nhood_size
        )
    embed = make_clip_image_embedder(clip_checkpoint)
    fallback = embed is None
    if fallback and not allow_fallback:
        raise RuntimeError(
            "image eval: CLIP checkpoint missing "
            f"({clip_checkpoint or 'no --clip_checkpoint'}) — pixel-fallback "
            "embeddings are NOT a perceptual metric space. Pass "
            "--allow_fallback for relative-only numbers."
        )
    if fallback:
        log.log(
            "image eval: no CLIP checkpoint — pixel-statistics embeddings "
            "(relative comparisons only)"
        )
        embed = _pixel_fallback_embed

    def collect(path):
        imgs = load_image_batch(path, limit=eval_num)
        out = [
            embed(imgs[i : i + batch_size]) for i in range(0, len(imgs), batch_size)
        ]
        return np.concatenate(out)

    log.log(f"embedding sample set: {sample_path}")
    sample = collect(sample_path)
    log.log(f"embedding ref set: {ref_path}")
    ref = collect(ref_path)
    log.log(f"evaluate for {len(ref)} ref / {len(sample)} sample images")
    prec, rec = precision_recall(ref, sample, k=nhood_size)
    return {
        "fid": frechet_distance(sample, ref),
        "kid": polynomial_mmd(sample, ref),
        "precision": prec,
        "recall": rec,
        "image_embedder": "pixel_fallback" if fallback else "clip_visual",
        # CLIP-FID even with the checkpoint: the published InceptionV3
        # protocol needs the frozen graph — pass inception_pb for it
        "protocol": "fallback" if fallback else "clip",
    }


def _eval_images_inception(
    ref_path: str,
    sample_path: str,
    inception_pb: str,
    eval_num: Optional[int],
    batch_size: int,
    nhood_size: int,
) -> Dict[str, float]:
    """The OpenAI evaluator's exact metric suite over the frozen TF1 graph
    (evaluations/evaluator.py:120-195): IS on the sample softmax, FID on
    pool_3, sFID on the mixed_6/conv[...,:7] spatial head, precision/recall
    on pool_3 — all from the published classify_image_graph_def.pb, executed
    with jax ops (no TensorFlow)."""
    from .graphdef import InceptionV3Features, inception_score_openai

    log = logger.get_current()
    feats = InceptionV3Features(inception_pb)

    def collect(path):
        imgs = load_image_batch(path, limit=eval_num)
        pools, spatials = [], []
        for i in range(0, len(imgs), batch_size):
            p, s = feats.features(imgs[i : i + batch_size].astype(np.float32))
            pools.append(p)
            spatials.append(s)
        return np.concatenate(pools), np.concatenate(spatials)

    log.log(f"inception-embedding sample set: {sample_path}")
    sample_pool, sample_spatial = collect(sample_path)
    log.log(f"inception-embedding ref set: {ref_path}")
    ref_pool, ref_spatial = collect(ref_path)
    log.log(f"evaluate for {len(ref_pool)} ref / {len(sample_pool)} sample images")
    prec, rec = precision_recall(ref_pool, sample_pool, k=nhood_size)
    return {
        "inception_score": inception_score_openai(feats.softmax(sample_pool)),
        "fid": frechet_distance(sample_pool, ref_pool),
        "sfid": frechet_distance(sample_spatial, ref_spatial),
        "kid": polynomial_mmd(sample_pool, ref_pool),
        "precision": prec,
        "recall": rec,
        "image_embedder": "inception_v3_tf1",
        "protocol": "openai",
    }
