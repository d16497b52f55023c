"""AudioCLIP audio tower (ESResNeXt-FBSP) in flax — the FAD embedding network.

TPU-native re-implementation of the reference's vendored AudioCLIP audio
branch (`evaluations/AudioCLIP/model/esresnet/{fbsp,base,attention}.py` and
`model/audioclip.py:77-95`), which the evaluator uses frozen to embed audio
for FAD (`mm_diffusion/evaluator.py:65,162`).  FAD uses the *unnormalized*
``encode_audio`` output (audioclip.py:214-215 raw_audio_features).

Pipeline (AudioCLIP config: n_fft 2048, hop 561, win 1654, blackman-harris,
normalized FBSP, native spec size (spec_height/width = -1, audioclip.py:57-58),
embed 1024, attention gates on):
  1. scale input from int16 range to [-1, 1] (base.py:605 — note the
     reference evaluator feeds [-1,1] floats into this same scaling; we
     replicate the behavior exactly for parity),
  2. frame the signal (centered zero-pad; utils/transforms.py:19-56),
  3. learned FBSP complex filterbank (fbsp.py:19-117) -> complex spectrogram,
  4. power -> 3 frequency bands (NO resize at the evaluator config; bilinear
     align_corners resize only when spec_height/width > 0) -> 10*log10
     (base.py:575-618),
  5. ResNeXt-50 (32x4d) with multiplicative attention gates
     (base.py:169-421, attention.py), per-audio-channel, pooled features
     summed over channels -> fc -> 1024-d embedding (base.py:620-637).

Weights convert from the published ``AudioCLIP-Full-Training.pt`` via
:func:`convert_audioclip_audio_tower` (``audio.*`` keys).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# -- AudioCLIP audio config (audioclip.py:52-60, 77-95) ------------------------
N_FFT = 2048
HOP_LENGTH = 561
WIN_LENGTH = 1654
EMBED_DIM = 1024
SPEC_SIZE = 224
N_BANDS = 3  # conv1.in_channels


def blackmanharris_window(n: int) -> np.ndarray:
    """scipy.signal.get_window('blackmanharris', n, fftbins=True)."""
    from scipy.signal import get_window

    return get_window("blackmanharris", n, fftbins=True).astype(np.float32)


def scale_int16_range(x: jnp.ndarray) -> jnp.ndarray:
    """scale(x, -32768, 32767, -1, 1) (base.py:605)."""
    return (x - (-32768.0)) / (32767.0 - (-32768.0)) * 2.0 - 1.0


def frame_signal(signal: jnp.ndarray, frame_length: int, hop_length: int,
                 window: jnp.ndarray) -> jnp.ndarray:
    """[B, L] -> [B, num_frames, frame_length] with centered zero padding
    (parity: utils/transforms.py frame_signal)."""
    b, length = signal.shape
    if length <= frame_length:
        num_frames = 1
    else:
        num_frames = 1 + int(math.ceil((length - frame_length) / hop_length))
    pad_len = (num_frames - 1) * hop_length + frame_length
    if pad_len > length:
        extra = pad_len - length
        signal = jnp.pad(signal, ((0, 0), (extra // 2, extra - extra // 2)))
    starts = np.arange(num_frames) * hop_length
    idx = starts[:, None] + np.arange(frame_length)[None, :]
    frames = signal[:, idx]  # [B, F, frame_length]
    return frames * window[None, None, :]


def fbsp_weights(m: jnp.ndarray, fb: jnp.ndarray, fc: jnp.ndarray,
                 in_features: int, normalized: bool = True, eps: float = 1e-8):
    """Materialize the complex FBSP filterbank (parity: fbsp.py:67-93).

    Returns ``(w_real, w_imag)`` each ``[out_features, in_features]``.
    """
    t = (np.pi * jnp.linspace(-1.0, 1.0, in_features))[None, :] + eps  # [1, N]
    m_ = m[:, None]
    fb_ = fb[:, None]
    fc_ = fc[:, None]

    kernel_re = jnp.cos(fc_ * t)
    kernel_im = -jnp.sin(fc_ * t)
    scale = jnp.sqrt(fb_)
    win_arg = fb_ * t / (m_ + eps)
    win = jnp.where(win_arg == 0, jnp.ones_like(win_arg), jnp.sin(win_arg) / win_arg)

    # complex power win^m with real exponent m (fbsp.py:48-61); win is real so
    # phase = atan2(0, win) = 0 for win>0, pi for win<0.
    mag = jnp.abs(win)
    phase = jnp.where(win >= 0, 0.0, np.pi)
    pow_mag = (mag**2) ** (0.5 * m_)
    win_re = pow_mag * jnp.cos(m_ * phase)
    win_im = pow_mag * jnp.sin(m_ * phase)

    w_re = scale * (win_re * kernel_re - win_im * kernel_im)
    w_im = scale * (win_re * kernel_im + win_im * kernel_re)
    if normalized:
        w_re = w_re / (in_features**0.5)
        w_im = w_im / (in_features**0.5)
    return w_re, w_im


def _adaptive_axis_max(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    """Max-reduce one axis to ``out_size`` with torch AdaptiveMaxPool window
    semantics: window i spans [floor(i*n/o), ceil((i+1)*n/o))."""
    n = x.shape[axis]
    if n == out_size:
        return x
    starts = (np.arange(out_size) * n) // out_size
    ends = -(-((np.arange(out_size) + 1) * n) // out_size)  # ceil
    width = int((ends - starts).max())
    # gather indices clipped to each window's end (duplicates are no-ops for max)
    idx = starts[:, None] + np.arange(width)[None, :]
    idx = np.minimum(idx, ends[:, None] - 1)  # [out, width]
    g = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis : axis + 1] = [out_size, width]
    return g.reshape(new_shape).max(axis=axis + 1)


def adaptive_max_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch ``F.adaptive_max_pool2d`` on NHWC (windows are cartesian products
    of per-axis intervals, so the max is separable)."""
    x = _adaptive_axis_max(x, 1, out_hw[0])
    x = _adaptive_axis_max(x, 2, out_hw[1])
    return x


def resize_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (torch F.interpolate semantics,
    base.py:589-595); jax.image.resize only offers half-pixel centers."""
    b, c, h, w = x.shape  # NCHW here (pre-backbone)

    def grid(in_size, out_size):
        if out_size == 1:
            return jnp.zeros((1,))
        return jnp.linspace(0.0, in_size - 1.0, out_size)

    ys, xs = grid(h, out_h), grid(w, out_w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (ys - y0).reshape(1, 1, -1, 1)
    wx = (xs - x0).reshape(1, 1, 1, -1)
    g00 = x[:, :, y0][:, :, :, x0]
    g01 = x[:, :, y0][:, :, :, x1]
    g10 = x[:, :, y1][:, :, :, x0]
    g11 = x[:, :, y1][:, :, :, x1]
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


class FrozenBN(nn.Module):
    """Eval-mode BatchNorm with imported running stats."""

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9, name="bn"
        )(x)


class Bottleneck(nn.Module):
    """ResNeXt bottleneck (parity: base.py:111-166 / torchvision)."""

    planes: int
    stride: int = 1
    groups: int = 32
    base_width: int = 4
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * 4
        h = nn.Conv(width, (1, 1), use_bias=False, name="conv1")(x)
        h = FrozenBN(name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            width, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=self.groups, use_bias=False, name="conv2",
        )(h)
        h = FrozenBN(name="bn2")(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h)
        h = FrozenBN(name="bn3")(h)
        if self.downsample:
            x = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv",
            )(x)
            x = FrozenBN(name="downsample_bn")(x)
        return nn.relu(x + h)


class Attention2d(nn.Module):
    """Multiplicative gate (parity: esresnet/attention.py:7-40): adaptive max
    pool to the gated tensor's size -> depthwise conv -> pointwise conv ->
    BN -> sigmoid."""

    in_channels: int
    out_channels: int
    kernel_size: Tuple[int, int]
    padding: Tuple[int, int]

    @nn.compact
    def __call__(self, x, out_hw):
        x = adaptive_max_pool(x, out_hw)
        x = nn.Conv(
            self.in_channels, self.kernel_size,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            feature_group_count=self.in_channels, name="conv_depth",
        )(x)
        x = nn.Conv(self.out_channels, (1, 1), name="conv_point")(x)
        x = FrozenBN(name="bn")(x)
        return nn.sigmoid(x)


LAYERS = (3, 4, 6, 3)
PLANES = (64, 128, 256, 512)
ATT_CFG = (  # (kernel, padding) per gate (base.py:217-263)
    ((3, 1), (1, 0)),
    ((1, 5), (0, 2)),
    ((3, 1), (1, 0)),
    ((1, 5), (0, 2)),
    ((3, 5), (1, 2)),
)


class ESResNeXtFBSP(nn.Module):
    """The complete audio tower: FBSP front end + attention-gated ResNeXt-50.

    Input ``[B, C_audio, L]`` (the reference's layout), output ``[B, 1024]``
    unnormalized embeddings (== raw_audio_features for FAD).

    ``spec_height/spec_width`` default to -1 — the AudioCLIP evaluator config
    (model/audioclip.py:57-58): the backbone runs on the NATIVE [3, 341, T]
    band-split spectrogram with no resize (base.py:585-598 only interpolates
    when the requested size differs).  Audio channels run the backbone
    independently and their pooled features are summed before the fc head
    (base.py:620-637 _forward_features/_forward_reduction channel loop).
    """

    embed_dim: int = EMBED_DIM
    apply_attention: bool = True
    spec_height: int = -1
    spec_width: int = -1

    @nn.compact
    def __call__(self, audio):
        b, n_ch = audio.shape[0], audio.shape[1]
        # -- front end ---------------------------------------------------------
        x = scale_int16_range(audio.reshape(-1, audio.shape[-1]).astype(jnp.float32))
        window = jnp.asarray(blackmanharris_window(WIN_LENGTH))
        frames = frame_signal(x, WIN_LENGTH, HOP_LENGTH, window)
        pad = N_FFT - WIN_LENGTH
        frames = jnp.pad(frames, ((0, 0), (0, 0), (pad // 2, pad - pad // 2)))

        n_out = N_FFT // 2 + 1
        m = self.param("fbsp_m", nn.initializers.zeros, (n_out,))
        fb = self.param("fbsp_fb", nn.initializers.ones, (n_out,))
        fc = self.param(
            "fbsp_fc", lambda k, s: jnp.arange(s[0], dtype=jnp.float32), (n_out,)
        )
        w_re, w_im = fbsp_weights(m, fb, fc, N_FFT, normalized=True)
        spec_re = frames @ w_re.T  # [B*C, T, n_out]
        spec_im = frames @ w_im.T
        # transpose(-2,-3): [B*C, n_out, T]
        pow_spec = spec_re**2 + spec_im**2
        pow_spec = jnp.swapaxes(pow_spec, -1, -2)

        # split into 3 bands (base.py:575-583)
        per_band = n_out // N_BANDS
        pow_spec = pow_spec[:, : per_band * N_BANDS]
        pow_spec = pow_spec.reshape(b * n_ch, N_BANDS, per_band, pow_spec.shape[-1])
        sh = per_band if self.spec_height < 1 else self.spec_height
        sw = pow_spec.shape[-1] if self.spec_width < 1 else self.spec_width
        if (sh, sw) != pow_spec.shape[-2:]:
            pow_spec = resize_bilinear_align_corners(pow_spec, sh, sw)
        pow_spec = jnp.where(pow_spec > 0.0, pow_spec, 1e-18)
        x_db = jnp.log10(pow_spec) * 10.0  # [B*C, 3, H, W]

        # -- backbone (NHWC), shared params across audio channels --------------
        h = jnp.transpose(x_db, (0, 2, 3, 1))
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1")(h)
        h = FrozenBN(name="bn1")(h)
        h = nn.relu(h)
        h = nn.max_pool(jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf),
                        window_shape=(3, 3), strides=(2, 2))

        for li, (blocks, planes) in enumerate(zip(LAYERS, PLANES)):
            gate_in = h
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                h = Bottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0),
                    name=f"layer{li + 1}_{bi}",
                )(h)
            if self.apply_attention:
                k, p = ATT_CFG[li]
                att = Attention2d(
                    gate_in.shape[-1], h.shape[-1], k, p, name=f"att{li + 1}"
                )(gate_in, h.shape[1:3])
                h = h * att

        gate_in = h
        pooled = jnp.mean(h, axis=(1, 2), keepdims=True)
        if self.apply_attention:
            k, p = ATT_CFG[4]
            att = Attention2d(h.shape[-1], h.shape[-1], k, p, name="att5")(
                gate_in, (1, 1)
            )
            pooled = pooled * att
        # sum pooled features over audio channels, then classify (base.py:630-637)
        feat = pooled.reshape(b, n_ch, -1).sum(axis=1)
        return nn.Dense(self.embed_dim, name="fc")(feat)


# ---------------------------------------------------------------------------
# torch checkpoint conversion (AudioCLIP-Full-Training.pt, audio.* keys)
# ---------------------------------------------------------------------------

def _conv(sd, key):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))


def _grouped_conv(sd, key, groups):
    """torch grouped conv weight [O, I/g, kh, kw] -> flax [kh, kw, I/g, O]."""
    return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {"bn": {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}},
        {"bn": {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.running_var"])}},
    )


def convert_audioclip_audio_tower(state_dict: Dict[str, Any], prefix: str = "audio."):
    """``AudioCLIP-Full-Training.pt`` -> variables for :class:`ESResNeXtFBSP`.

    Returns ``{"params": ..., "batch_stats": ...}``.
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["fbsp_m"] = np.asarray(sd["fbsp.m"])
    params["fbsp_fb"] = np.asarray(sd["fbsp.fb"])
    params["fbsp_fc"] = np.asarray(sd["fbsp.fc"])
    params["conv1"] = {"kernel": _conv(sd, "conv1.weight")}
    p, s = _bn(sd, "bn1")
    params["bn1"], stats["bn1"] = p, s

    for li, blocks in enumerate(LAYERS):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _grouped_conv(sd, f"{tp}.conv{ci}.weight", 32)}
                p, s = _bn(sd, f"{tp}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd, f"{tp}.downsample.0.weight")}
                p, s = _bn(sd, f"{tp}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[name], stats[name] = bp, bs

    for ai in range(1, 6):
        tp = f"att{ai}"
        if f"{tp}.conv_depth.weight" not in sd:
            continue
        ap = {
            "conv_depth": {
                "kernel": _conv(sd, f"{tp}.conv_depth.weight"),
                "bias": np.asarray(sd[f"{tp}.conv_depth.bias"]),
            },
            "conv_point": {
                "kernel": _conv(sd, f"{tp}.conv_point.weight"),
                "bias": np.asarray(sd[f"{tp}.conv_point.bias"]),
            },
        }
        p, s = _bn(sd, f"{tp}.bn")
        ap["bn"] = p
        params[tp], stats[tp] = ap, {"bn": s}

    params["fc"] = {
        "kernel": np.transpose(np.asarray(sd["fc.weight"]), (1, 0)),
        "bias": np.asarray(sd["fc.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def load_audioclip_audio_tower(checkpoint_path: str):
    """Load + convert the published AudioCLIP checkpoint for FAD embedding.

    Accepts the torch ``.pt`` or a native Orbax directory from
    ``tools/convert_weights.py audioclip[_audio]`` (torch-free)."""
    import os

    if os.path.isdir(checkpoint_path):
        from ..train.checkpoint import restore_params

        tree = restore_params(checkpoint_path)
        if isinstance(tree, dict) and "audio" in tree and "visual" in tree:
            tree = tree["audio"]  # full-AudioCLIP conversion layout
        return ESResNeXtFBSP(), tree
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    variables = convert_audioclip_audio_tower(
        {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    )
    return ESResNeXtFBSP(), variables
