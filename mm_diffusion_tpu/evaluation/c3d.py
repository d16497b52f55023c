"""C3D (UCF-101) video Inception Score — the exact legacy protocol.

The reference computes video IS with a chainer C3D network
(`evaluations/c3d/c3d_ft.py:19-78`, driven by
`evaluations/compute_video_is.py:55-90`).  The published weights
(``conv3d_deepnetA_ucf.npz``) are chainer's *plain numpy* ``.npz`` format —
no chainer is needed to read them — and the architecture is a short
sequential (8 conv3d + 3 fc + softmax over 101 UCF classes), so this module
reproduces the protocol exactly in jax:

* weights: ``{conv1a..conv5b}/W [O,I,kT,kH,kW]`` + ``/b``, ``fc{6,7,8}/W``
  + ``/b``, loaded with ``np.load`` (leading-slash key variants accepted);
* preprocessing (`compute_video_is.py:57-75`): per-frame cv2 INTER_CUBIC
  resize to 128², RGB→BGR channel reversal, subtraction of the
  ``mean2.npz`` clip mean (reshaped ``(3,1,16,128,171)`` and column-cropped
  ``21:149``), then a fixed 8:120 spatial crop to 112²;
* model: convs pad-1/stride-1 + ReLU; pool1 spatial-only, pools 2-5 cubic
  k=2 with chainer's ``cover_all`` (ceil) semantics — equal to TF-SAME for
  k=s=2, which turns the 7² pool-4 output into pool-5's 4²; fc6 flattens in
  chainer's channel-major ``(C,T,H,W)`` order;
* IS: the TGAN ``calc_inception`` formula (`compute_video_is.py:21-26`):
  one split over all samples, eps 1e-7.

Deviation (deliberate): dropout is OFF here.  The reference evaluates under
``with chainer.using_config('train', False) and chainer.no_backprop_mode():``
(`compute_video_is.py:79-80`) — in Python ``with A and B:`` enters only
``B``, so the upstream script actually runs with train-mode *stochastic
dropout* in fc6/fc7, an inherited TGAN-lineage bug.  Deterministic eval-mode
is the published metric's intent.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..utils import logger

_CONVS = ("conv1a", "conv2a", "conv3a", "conv3b", "conv4a", "conv4b", "conv5a", "conv5b")
_FCS = ("fc6", "fc7", "fc8")


def load_c3d_npz(path: str) -> Dict[str, np.ndarray]:
    """Read chainer-format C3D weights (plain numpy .npz) into
    {name: {"W": ..., "b": ...}} with flax-friendly conv kernels
    ([O,I,kT,kH,kW] -> [kT,kH,kW,I,O])."""
    with np.load(path) as z:
        raw = {k.lstrip("/"): np.asarray(z[k], np.float32) for k in z.files}
    params: Dict[str, Dict[str, np.ndarray]] = {}
    for name in _CONVS:
        w = raw[f"{name}/W"]
        if w.ndim != 5:
            raise ValueError(f"{name}/W has shape {w.shape}, expected 5-D conv")
        params[name] = {
            "W": np.transpose(w, (2, 3, 4, 1, 0)),
            "b": raw[f"{name}/b"],
        }
    for name in _FCS:
        params[name] = {"W": raw[f"{name}/W"], "b": raw[f"{name}/b"]}
    return params


def c3d_apply(params: Dict[str, Dict[str, np.ndarray]], x):
    """Forward the C3D graph (c3d_ft.py:60-78) on ``x`` [B,T,H,W,C_bgr]
    (preprocessed, 16x112x112x3) -> class posteriors [B, 101]."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def conv(name, h):
        return (
            lax.conv_general_dilated(
                h,
                jnp.asarray(params[name]["W"]),
                window_strides=(1, 1, 1),
                padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            + jnp.asarray(params[name]["b"])
        )

    def pool(h, window):
        # chainer max_pooling_nd(ksize=k): stride=k, cover_all=True (ceil
        # windows over an implicit -inf pad) == TF-SAME when k == s == 2;
        # this is what turns pool4's 7^2 into pool5's 4^2 (c3d_ft.py:120-128)
        return lax.reduce_window(h, -jnp.inf, lax.max, window, window, "SAME")

    h = jnp.maximum(conv("conv1a", x), 0)
    h = pool(h, (1, 1, 2, 2, 1))
    h = jnp.maximum(conv("conv2a", h), 0)
    h = pool(h, (1, 2, 2, 2, 1))
    h = jnp.maximum(conv("conv3b", jnp.maximum(conv("conv3a", h), 0)), 0)
    h = pool(h, (1, 2, 2, 2, 1))
    h = jnp.maximum(conv("conv4b", jnp.maximum(conv("conv4a", h), 0)), 0)
    h = pool(h, (1, 2, 2, 2, 1))
    h = jnp.maximum(conv("conv5b", jnp.maximum(conv("conv5a", h), 0)), 0)
    h = pool(h, (1, 2, 2, 2, 1))
    # chainer Linear flattens the (C, T, H, W) layout — transpose first
    h = jnp.transpose(h, (0, 4, 1, 2, 3)).reshape(h.shape[0], -1)
    h = jnp.maximum(h @ params["fc6"]["W"].T + params["fc6"]["b"], 0)
    h = jnp.maximum(h @ params["fc7"]["W"].T + params["fc7"]["b"], 0)
    logits = h @ params["fc8"]["W"].T + params["fc8"]["b"]
    return jax.nn.softmax(logits, axis=-1)


def load_c3d_mean(path: str) -> np.ndarray:
    """``mean2.npz`` -> the BGR clip mean [3,1,16,128,128]
    (compute_video_is.py:57-58)."""
    mean = np.load(path)["mean"].astype(np.float32)
    return mean.reshape((3, 1, 16, 128, 171))[:, :, :, :, 21 : 21 + 128]


def preprocess_videos_c3d(videos_rgb: np.ndarray, mean: np.ndarray) -> np.ndarray:
    """uint8 RGB ``[N,16,H,W,3]`` -> model input ``[N,16,112,112,3]`` BGR,
    mean-subtracted (compute_video_is.py:64-75)."""
    import cv2

    n, f, h, w, c = videos_rgb.shape
    if f < 16:  # util.py:247-248: pad short clips by repeating the last frame
        videos_rgb = np.concatenate(
            [videos_rgb, np.repeat(videos_rgb[:, -1:], 16 - f, axis=1)], axis=1
        )[:, :16]
        f = 16
    flat = videos_rgb.reshape(n * f, h, w, c)
    resized = np.zeros((n * f, 128, 128, 3), np.float32)
    for t in range(n * f):
        resized[t] = cv2.resize(flat[t], (128, 128), interpolation=cv2.INTER_CUBIC)
    x = resized.transpose(3, 0, 1, 2).reshape(c, n, f, 128, 128)
    x = x[::-1] - mean  # RGB -> BGR, then subtract the BGR-order mean
    x = x[:, :, :, 8 : 8 + 112, 8 : 8 + 112]
    return np.ascontiguousarray(x.transpose(1, 2, 3, 4, 0), np.float32)  # NTHWC


def calc_inception_tgan(ys: np.ndarray) -> float:
    """The TGAN IS formula (compute_video_is.py:21-26): single split,
    eps 1e-7."""
    p_all = np.mean(ys, axis=0, keepdims=True)
    kl = np.sum(ys * np.log(ys + 1e-7) - ys * np.log(p_all + 1e-7)) / ys.shape[0]
    return float(np.exp(kl))


def video_inception_score_c3d(
    videos_rgb: np.ndarray,
    c3d_npz: str,
    mean_npz: str,
    batch_size: int = 16,
    params: Optional[Dict] = None,
) -> float:
    """End-to-end exact-protocol video IS over uint8 RGB [N,F,H,W,3]."""
    import jax

    log = logger.get_current()
    params = load_c3d_npz(c3d_npz) if params is None else params
    mean = load_c3d_mean(mean_npz)
    apply = jax.jit(lambda x: c3d_apply(params, x))
    ys = []
    for i in range(0, len(videos_rgb), batch_size):
        x = preprocess_videos_c3d(videos_rgb[i : i + batch_size], mean)
        ys.append(np.asarray(jax.device_get(apply(x))))
    ys = np.concatenate(ys)
    log.log(f"c3d video IS over {len(ys)} clips")
    return calc_inception_tgan(ys)
