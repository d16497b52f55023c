"""Attention blocks: factorized video self-attention and RS-MMA cross-modal
attention.

TPU-native re-design of `mm_diffusion/multimodal_unet.py:212-678`.  The
reference implements the random-shift multi-modal attention (RS-MMA) with a
Python loop over frames doing `index_select` gathers per frame
(multimodal_unet.py:530-559) — a trace-hostile pattern.  Here the same math is
one static gather plus two batched einsums:

* tokens are grouped by frame: video ``[B, F, H*W, h, d]``, audio
  ``[B, F, L/F, h, d]``;
* the (traced) random window shift enters only through a modular index
  computation ``(f + shift + j) % F`` — shapes stay static, XLA lowers the
  whole block to MXU matmuls;
* video queries attend to a ``local_window``-frame slice of audio keys and
  vice versa, exactly matching the reference's ``attention_index`` semantics
  (multimodal_unet.py:614-647) when ``L % F == 0`` (true at every U-Net level
  for the stock configs, since audio downsamples by 4 per level).

All softmaxes run in float32 (the reference's fp16 self-attention also casts
to fp32 at multimodal_unet.py:238; we extend this to cross-attention for bf16
safety).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from .layers import GroupNormFP32

Dtype = jnp.dtype


def _split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """[..., T, H*D] -> [..., T, H, D] with the reference's (head, dim) channel
    order (SingleModalQKVAttention views (bs, heads*ch, T), ref :233-239)."""
    *lead, t, hd = x.shape
    return x.reshape(*lead, t, num_heads, hd // num_heads)


def _merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    *lead, t, h, d = x.shape
    return x.reshape(*lead, t, h * d)


def qkv_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Batched multi-head attention over ``[..., T, H, D]`` tensors.

    Uses the reference's symmetric ``1/sqrt(sqrt(D))`` scaling of both q and k
    (multimodal_unet.py:232-237) and a float32 softmax.
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(d)))
    logits = jnp.einsum(
        "...qhd,...khd->...hqk",
        (q * scale.astype(q.dtype)),
        (k * scale.astype(k.dtype)),
        preferred_element_type=jnp.float32,
    )
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


class TokenSelfAttention(nn.Module):
    """Residual self-attention over ``[N, T, C]`` token sequences
    (parity: SingleModalAtten + SingleModalQKVAttention, ref :212-287).

    The packed qkv projection output feeds the layout-native block-attention
    kernel directly (ops/block_attention.py) — no heads-major transposes, no
    ragged-length padding; tiny-T inputs (the factorized temporal pass) are
    row-batched inside the kernel behind a block-diagonal mask."""

    channels: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    # channel-sum GN stats: lane-parallel formulation that avoids the stock
    # GroupNorm's group-reshape f32 storms under jax.checkpoint (see
    # layers.GroupNormFP32); set by blocks when cfg.use_checkpoint.
    gn_sums: bool = False

    @nn.compact
    def __call__(self, x):
        h = GroupNormFP32(name="norm", channel_sum_stats=self.gn_sums)(x)
        qkv = nn.Dense(
            3 * self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="qkv"
        )(h)
        # The attention custom_vjp's residual is this packed qkv; when the
        # remat policy also saves it, the backward replay can drop the
        # forward kernel re-run entirely (see mm_unet remat_policy).
        qkv = checkpoint_name(qkv, "attn_qkv")
        from ..ops.block_attention import dispatch_self_attention

        lead = qkv.shape[:-2]
        out = dispatch_self_attention(
            qkv.reshape(-1, *qkv.shape[-2:]), self.num_heads
        ).reshape(*lead, x.shape[-2], self.channels)
        # saved by the remat policy (mm_unet): re-running the attention
        # kernel in the backward recompute is the priciest part of the block
        out = checkpoint_name(out, "attn_out")
        out = nn.Dense(
            self.channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="proj_out",
        )(out)
        return x + out


class FactorizedVideoAttention(nn.Module):
    """Spatial attention (tokens = H*W per frame) followed by temporal
    attention (tokens = F per pixel) on ``[B, F, H, W, C]``
    (parity: ResBlock video attention path, ref :485-491)."""

    channels: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    gn_sums: bool = False

    @nn.compact
    def __call__(self, x):
        b, f, h, w, c = x.shape
        xs = x.reshape(b * f, h * w, c)
        xs = TokenSelfAttention(
            self.channels, self.num_heads, dtype=self.dtype, name="spatial",
            gn_sums=self.gn_sums,
        )(xs)
        xt = xs.reshape(b, f, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
        xt = TokenSelfAttention(
            self.channels, self.num_heads, dtype=self.dtype, name="temporal",
            gn_sums=self.gn_sums,
        )(xt)
        return xt.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)


def window_frame_indices(num_frames: int, local_window: int, shift) -> jnp.ndarray:
    """``idx[f, j] = (f + shift + j) % F`` — the frame each query-frame attends
    to, for j in [0, local_window).  Static shapes; ``shift`` may be traced.

    Matches the reference's flat-index windows with wraparound
    (multimodal_unet.py:624-638) given L % F == 0.
    """
    f_idx = jnp.arange(num_frames)[:, None]
    j_idx = jnp.arange(local_window)[None, :]
    return (f_idx + shift + j_idx) % num_frames


class RSMMACrossAttention(nn.Module):
    """Random-Shift Multi-Modal Attention (parity: CrossAttentionBlock +
    QKVAttention, multimodal_unet.py:498-678).

    Per frame f, the H*W video query tokens attend to audio tokens of frames
    ``(f+shift) .. (f+shift+local_window-1) (mod F)``; each frame's L/F audio
    query tokens attend to the video tokens of the same frame window.  The
    shift is drawn uniformly from [0, F - local_window] per forward pass when
    ``window_shift`` is on (ref :619-622) — at train AND sampling time, via
    the 'shift' PRNG collection when provided.
    """

    channels: int
    num_heads: int
    local_window: int
    window_shift: bool = False
    dtype: Dtype = jnp.bfloat16
    gn_sums: bool = False

    @nn.compact
    def __call__(self, video, audio):
        b, f, h, w, c = video.shape
        _, l, _ = audio.shape
        assert l % f == 0, f"audio length {l} must divide into {f} frames"
        apf = l // f
        lw = min(self.local_window, f)

        if self.window_shift and self.has_rng("shift"):
            shift = jax.random.randint(self.make_rng("shift"), (), 0, f - lw + 1)
        else:
            shift = 0

        v_tokens = video.reshape(b, f * h * w, c)
        v_qkv = nn.Dense(
            3 * self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="v_qkv"
        )(GroupNormFP32(name="v_norm", channel_sum_stats=self.gn_sums)(v_tokens))
        a_qkv = nn.Dense(
            3 * self.channels, dtype=self.dtype, param_dtype=jnp.float32, name="a_qkv"
        )(GroupNormFP32(name="a_norm", channel_sum_stats=self.gn_sums)(audio))

        # Packed per-frame views: both modalities' full [B,F,T,3C] qkv feed
        # the banded attention directly — the window never materializes (the
        # band lives in the kernel's scalar-prefetched index_map) and the
        # q/kv lane slices happen inside the kernel block reads (explicit
        # [..., :c] slicing cost a full extra HBM pass per operand).
        from ..ops.block_attention import dispatch_banded_attention_packed

        v_qkv = v_qkv.reshape(b, f, h * w, 3 * c)
        a_qkv = a_qkv.reshape(b, f, apf, 3 * c)
        nh = self.num_heads
        # video queries x audio key/value windows
        v_out = dispatch_banded_attention_packed(v_qkv, a_qkv, shift, lw, nh, c)
        # audio queries x video key/value windows
        a_out = dispatch_banded_attention_packed(a_qkv, v_qkv, shift, lw, nh, c)

        zero_dense = dict(
            features=self.channels,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )
        v_out = nn.Dense(name="video_proj_out", **zero_dense)(v_out)
        a_out = nn.Dense(name="audio_proj_out", **zero_dense)(a_out)
        v_out = v_out.reshape(b, f, h, w, c)
        a_out = a_out.reshape(b, l, c)
        return video + v_out, audio + a_out
