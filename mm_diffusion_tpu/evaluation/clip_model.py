"""CLIP visual (ModifiedResNet) and text towers in flax — the remaining
AudioCLIP branches.

TPU-native re-implementation of the reference's vendored CLIP
(`evaluations/AudioCLIP/model/clip/model.py`): the AudioCLIP configuration
uses the ResNet-50 visual variant (vision_layers=(3,4,6,3), width 64,
embed 1024 — model/audioclip.py:41-43), NOT the ViT.  Together with the
ESResNeXt-FBSP audio tower (evaluation/audioclip.py) this completes the
frozen AudioCLIP used by the reference evaluator:

* per-frame image embeddings -> normalized -> mean over frames = the video
  embedding (model/audioclip.py:221-232),
* AV alignment score = clamp(exp(logit_scale_ai), 1, 100) * a_hat @ v_hat
  per pair (:253-256, diag taken in get_embedding.py:77-78),
* text tower (transformer + causal mask + eot pooling) for the audio-text /
  video-text logits; the BPE tokenizer needs the vocab file
  ``bpe_simple_vocab_16e6.txt.gz`` (utils/simple_tokenizer.py:28-31 —
  downloaded at runtime by the reference, so gated here behind a path).

All weights convert from the published ``AudioCLIP-Full-Training.pt`` via
:func:`convert_clip_visual` / :func:`convert_clip_text`.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# CLIP preprocessing constants (get_embedding.py:11-13)
IMAGE_SIZE = 224
IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class FrozenBN(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=True, epsilon=1e-5, momentum=0.9, name="bn"
        )(x)


def _avg_pool(x, k):
    return nn.avg_pool(x, window_shape=(k, k), strides=(k, k))


class CLIPBottleneck(nn.Module):
    """(parity: clip/model.py Bottleneck, :11-55 — stride lives in an avgpool
    AFTER conv2, and the downsample branch is avgpool -> 1x1 conv)."""

    planes: int
    stride: int = 1
    downsample: bool = False

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * 4
        h = nn.relu(FrozenBN(name="bn1")(nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)))
        h = nn.relu(FrozenBN(name="bn2")(nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(h)))
        if self.stride > 1:
            h = _avg_pool(h, self.stride)
        h = FrozenBN(name="bn3")(nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(h))
        if self.downsample:
            idn = x if self.stride == 1 else _avg_pool(x, self.stride)
            idn = FrozenBN(name="downsample_bn")(
                nn.Conv(out_ch, (1, 1), use_bias=False, name="downsample_conv")(idn)
            )
        else:
            idn = x
        return nn.relu(h + idn)


class AttentionPool2d(nn.Module):
    """(parity: clip/model.py:57-92 — mean token prepended, learned positional
    embedding, one MHA step, CLS output)."""

    embed_dim: int
    num_heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(self.embed_dim**-0.5),
            (h * w + 1, self.embed_dim),
        )
        tokens = tokens + pos[None]

        def proj(name, feats, y):
            return nn.Dense(feats, name=name)(y)

        q = proj("q_proj", self.embed_dim, tokens[:, :1])  # query = CLS only
        k = proj("k_proj", self.embed_dim, tokens)
        v = proj("v_proj", self.embed_dim, tokens)
        hd = self.embed_dim // self.num_heads

        def split(t):
            return t.reshape(b, -1, self.num_heads, hd)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        w_ = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        pooled = jnp.einsum("bhqk,bkhd->bqhd", w_, v).reshape(b, 1, self.embed_dim)
        return nn.Dense(self.output_dim, name="c_proj")(pooled[:, 0])


class CLIPVisualResNet(nn.Module):
    """ModifiedResNet (parity: clip/model.py:94-152).

    Input: ``[B, 224, 224, 3]`` CLIP-normalized images.
    Output: ``[B, output_dim]`` image embeddings.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    output_dim: int = 1024
    width: int = 64
    heads: int = 32  # width * 32 // 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        for i, feats in enumerate((w // 2, w // 2, w)):
            stride = 2 if i == 0 else 1
            x = nn.Conv(
                feats, (3, 3), strides=(stride, stride), padding=1, use_bias=False,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(FrozenBN(name=f"bn{i + 1}")(x))
        x = _avg_pool(x, 2)

        inplanes = w
        for li, blocks in enumerate(self.layers):
            planes = w * (2**li)
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                x = CLIPBottleneck(
                    planes=planes,
                    stride=stride if bi == 0 else 1,
                    downsample=(bi == 0 and (stride > 1 or inplanes != planes * 4)),
                    name=f"layer{li + 1}_{bi}",
                )(x)
                inplanes = planes * 4
        return AttentionPool2d(
            embed_dim=w * 32, num_heads=self.heads, output_dim=self.output_dim,
            name="attnpool",
        )(x)


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    """(parity: clip/model.py:165-187; fp32 LayerNorm islands :155-161)."""

    d_model: int
    n_head: int
    causal: bool = True

    @nn.compact
    def __call__(self, x):  # [B, T, D]
        b, t, d = x.shape
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x.astype(jnp.float32)).astype(x.dtype)
        qkv = nn.Dense(3 * d, name="attn_in")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = d // self.n_head

        def split(tt):
            return tt.reshape(b, t, self.n_head, hd)

        logits = jnp.einsum("bqhd,bkhd->bhqk", split(q), split(k)) / np.sqrt(hd)
        if self.causal:
            mask = jnp.triu(jnp.full((t, t), -jnp.inf), k=1)
            logits = logits + mask[None, None]
        w_ = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        att = jnp.einsum("bhqk,bkhd->bqhd", w_, split(v)).reshape(b, t, d)
        x = x + nn.Dense(d, name="attn_out")(att)

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Dense(4 * d, name="c_fc")(h)
        h = nn.Dense(d, name="c_proj")(quick_gelu(h))
        return x + h


class CLIPTextEncoder(nn.Module):
    """(parity: CLIP.encode_text, clip/model.py:343-357 — causal transformer,
    eot-token (argmax id) pooling, text projection)."""

    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 1024

    @nn.compact
    def __call__(self, tokens):  # [B, T] int32
        x = nn.Embed(self.vocab_size, self.width, name="token_embedding")(tokens)
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = x + pos[None, : x.shape[1]]
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, causal=True, name=f"resblock_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x.astype(jnp.float32))
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        return pooled @ proj


# ---------------------------------------------------------------------------
# torch checkpoint conversion (AudioCLIP-Full-Training.pt)
# ---------------------------------------------------------------------------


def _conv(sd, key):
    return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))


def _bn(sd, prefix):
    return (
        {"bn": {"scale": np.asarray(sd[f"{prefix}.weight"]),
                "bias": np.asarray(sd[f"{prefix}.bias"])}},
        {"bn": {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
                "var": np.asarray(sd[f"{prefix}.running_var"])}},
    )


def _dense(sd, prefix):
    return {
        "kernel": np.transpose(np.asarray(sd[f"{prefix}.weight"]), (1, 0)),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
    }


def convert_clip_visual(state_dict: Dict[str, Any], prefix: str = "visual.",
                        layers: Sequence[int] = (3, 4, 6, 3)):
    """``visual.*`` keys -> variables for :class:`CLIPVisualResNet`."""
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": _conv(sd, f"conv{i}.weight")}
        p, s = _bn(sd, f"bn{i}")
        params[f"bn{i}"], stats[f"bn{i}"] = p, s
    for li, blocks in enumerate(layers):
        for bi in range(blocks):
            tp = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {"kernel": _conv(sd, f"{tp}.conv{ci}.weight")}
                p, s = _bn(sd, f"{tp}.bn{ci}")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = p, s
            if f"{tp}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {"kernel": _conv(sd, f"{tp}.downsample.0.weight")}
                p, s = _bn(sd, f"{tp}.downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            params[name], stats[name] = bp, bs
    params["attnpool"] = {
        "positional_embedding": np.asarray(sd["attnpool.positional_embedding"]),
        "q_proj": _dense(sd, "attnpool.q_proj"),
        "k_proj": _dense(sd, "attnpool.k_proj"),
        "v_proj": _dense(sd, "attnpool.v_proj"),
        "c_proj": _dense(sd, "attnpool.c_proj"),
    }
    return {"params": params, "batch_stats": stats}


def convert_clip_text(state_dict: Dict[str, Any], layers: int = 12):
    """Top-level text-tower keys -> variables for :class:`CLIPTextEncoder`."""
    sd = state_dict
    params: Dict[str, Any] = {
        "token_embedding": {"embedding": np.asarray(sd["token_embedding.weight"])},
        "positional_embedding": np.asarray(sd["positional_embedding"]),
        "ln_final": {"scale": np.asarray(sd["ln_final.weight"]),
                     "bias": np.asarray(sd["ln_final.bias"])},
        "text_projection": np.asarray(sd["text_projection"]),
    }
    for i in range(layers):
        tp = f"transformer.resblocks.{i}"
        params[f"resblock_{i}"] = {
            "ln_1": {"scale": np.asarray(sd[f"{tp}.ln_1.weight"]),
                     "bias": np.asarray(sd[f"{tp}.ln_1.bias"])},
            "ln_2": {"scale": np.asarray(sd[f"{tp}.ln_2.weight"]),
                     "bias": np.asarray(sd[f"{tp}.ln_2.bias"])},
            "attn_in": {
                "kernel": np.transpose(np.asarray(sd[f"{tp}.attn.in_proj_weight"]), (1, 0)),
                "bias": np.asarray(sd[f"{tp}.attn.in_proj_bias"]),
            },
            "attn_out": _dense(sd, f"{tp}.attn.out_proj"),
            "c_fc": _dense(sd, f"{tp}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{tp}.mlp.c_proj"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# Full-AudioCLIP assembly: AV embeddings + alignment scores
# ---------------------------------------------------------------------------


def preprocess_frames_for_clip(videos_uint8: np.ndarray) -> np.ndarray:
    """uint8 [B, F, H, W, 3] -> CLIP-normalized float32 [B, F, 224, 224, 3]
    (parity: get_embedding.py IMAGE_TRANSFORM — bicubic resize, center crop,
    mean/std normalize)."""
    b, f, h, w, _ = videos_uint8.shape
    flat = videos_uint8.reshape(b * f, h, w, 3)
    if (h, w) != (IMAGE_SIZE, IMAGE_SIZE):
        try:
            import cv2

            scale = IMAGE_SIZE / min(h, w)
            nh, nw = int(round(h * scale)), int(round(w * scale))
            flat = np.stack(
                [cv2.resize(fr, (nw, nh), interpolation=cv2.INTER_CUBIC) for fr in flat]
            )
            top, left = (nh - IMAGE_SIZE) // 2, (nw - IMAGE_SIZE) // 2
            flat = flat[:, top : top + IMAGE_SIZE, left : left + IMAGE_SIZE]
        except ImportError:
            xs = np.linspace(0, h - 1, IMAGE_SIZE).astype(int)
            ys = np.linspace(0, w - 1, IMAGE_SIZE).astype(int)
            flat = flat[:, xs][:, :, ys]
    out = flat.astype(np.float32) / 255.0
    out = (out - IMAGE_MEAN) / IMAGE_STD
    return out.reshape(b, f, IMAGE_SIZE, IMAGE_SIZE, 3)


class AudioCLIPScorer:
    """Frozen full-AudioCLIP embedder: audio/video embeddings + AV score
    (parity surface: get_audioclip_embeddings_scores, get_embedding.py:69-78)."""

    def __init__(self, audio_model, audio_vars, visual_model, visual_vars,
                 logit_scale_ai: float):
        self._audio = jax.jit(lambda a: audio_model.apply(audio_vars, a))
        self._visual = jax.jit(lambda v: visual_model.apply(visual_vars, v))
        self.scale_ai = float(np.clip(np.exp(logit_scale_ai), 1.0, 100.0))

    def embed_audio(self, audio_batch: np.ndarray) -> np.ndarray:
        """[B, C, L] or [B, L, C] -> raw (unnormalized) [B, 1024] — the FAD
        embedding (audioclip.py:242 raw_audio_features)."""
        a = np.asarray(audio_batch, np.float32)
        if a.ndim == 3 and a.shape[-1] <= 4:
            a = np.transpose(a, (0, 2, 1))
        elif a.ndim == 2:
            a = a[:, None, :]
        return np.asarray(jax.device_get(self._audio(jnp.asarray(a))))

    def embed_video(self, videos_uint8: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """uint8 [B,F,H,W,3] -> (raw video emb = mean of per-frame raw image
        embeddings, normalized per-frame mean) (audioclip.py:221-232)."""
        pre = preprocess_frames_for_clip(videos_uint8)
        b, f = pre.shape[:2]
        flat = jnp.asarray(pre.reshape(b * f, IMAGE_SIZE, IMAGE_SIZE, 3))
        raw = np.asarray(jax.device_get(self._visual(flat)))  # [B*F, D]
        raw_bf = raw.reshape(b, f, -1)
        normed = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
        return raw_bf.mean(axis=1), normed.reshape(b, f, -1).mean(axis=1)

    def av_scores(self, audio_batch: np.ndarray, videos_uint8: np.ndarray) -> np.ndarray:
        """Per-pair AV alignment scores (diag of logits_audio_video,
        audioclip.py:253-256 + get_embedding.py:77)."""
        a = self.embed_audio(audio_batch)
        a = a / np.linalg.norm(a, axis=-1, keepdims=True)
        _, v_mean_normed = self.embed_video(videos_uint8)
        return self.scale_ai * np.sum(a * v_mean_normed, axis=-1)


def load_audioclip_full(checkpoint_path: str) -> AudioCLIPScorer:
    """Build the frozen audio+visual AudioCLIP from the published
    ``AudioCLIP-Full-Training.pt`` or from a native Orbax directory
    produced by ``tools/convert_weights.py audioclip`` (torch-free)."""
    import os

    from .audioclip import ESResNeXtFBSP, convert_audioclip_audio_tower

    if os.path.isdir(checkpoint_path):
        from ..train.checkpoint import restore_params

        tree = restore_params(checkpoint_path)
        return AudioCLIPScorer(
            ESResNeXtFBSP(),
            tree["audio"],
            CLIPVisualResNet(),
            tree["visual"],
            float(np.asarray(tree["scale_ai"])),
        )
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    audio_vars = convert_audioclip_audio_tower(sd, prefix="audio.")
    visual_vars = convert_clip_visual(sd, prefix="visual.")
    scale_ai = float(np.asarray(sd.get("logit_scale_ai", np.log(100.0))))
    return AudioCLIPScorer(
        ESResNeXtFBSP(), audio_vars, CLIPVisualResNet(), visual_vars, scale_ai
    )
