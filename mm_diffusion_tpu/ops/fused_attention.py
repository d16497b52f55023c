"""Fused (flash) multi-head attention dispatch.

The hot ops of the MM-UNet are its attention blocks: at ds=2 the spatial
self-attention runs 1024-token sequences over batch*frames rows, and RS-MMA
cross-attention attends 1024 video tokens to 400-sample audio windows
(SURVEY §2.6 identifies these as the only non-library-primitive ops worth a
kernel).  A plain einsum materializes the full [.., T_q, T_k] float32 logits
tensor in HBM; the Pallas TPU flash-attention kernel keeps the softmax
streaming in VMEM.

Dispatch policy:
* TPU + sequences long enough to tile (>= 2*MIN_BLOCK) -> Pallas flash
  attention (with padding + segment-id masking for ragged kv lengths);
* otherwise -> the reference einsum path (`models.attention.qkv_attention`),
  which is also the numerics oracle in tests.

Scaling parity: the reference scales q and k each by ``1/sqrt(sqrt(D))``
(multimodal_unet.py:232-237) == one logit scale of ``1/sqrt(D)``.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

try:  # the kernel lives in jax.experimental; gate for non-TPU builds
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    _HAS_FLASH = True
except Exception:  # pragma: no cover
    _HAS_FLASH = False

_BLOCK = 128  # TPU flash kernel block granularity


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _use_flash(t_q: int, t_k: int, d: int) -> bool:
    if not _HAS_FLASH:
        return False
    if jax.default_backend() != "tpu":
        return False
    # Profitable whenever the materialized [t_q, t_k] logits would be large
    # (the einsum path writes them to HBM in fp32); short ragged q (the
    # audio-side RS-MMA queries, e.g. 100 tokens vs 1024 keys) pads to one
    # 128 block and still wins by a wide margin.
    return t_q * t_k >= 32768 and t_q >= 16 and d <= 256


def flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention over ``[B, T, H, D]`` tensors (same contract as
    `models.attention.qkv_attention`), flash-fused on TPU when profitable."""
    b, t_q, h, d = q.shape
    out = flash_mha_bhtd(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    )
    return jnp.swapaxes(out, 1, 2)


def flash_mha_bhtd(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention over ``[B, H, T, D]`` tensors (kernel-native
    layout — callers that keep heads-major avoid a materialized transpose on
    each side of the custom call)."""
    b, h, t_q, d = q.shape
    t_k = k.shape[2]
    if not _use_flash(t_q, t_k, d):
        from ..models.attention import qkv_attention

        out = qkv_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        )
        return jnp.swapaxes(out, 1, 2)

    sm_scale = 1.0 / math.sqrt(d)
    qt, kt, vt = q, k, v

    q_pad = _pad_to(qt, 2, _BLOCK)
    k_pad = _pad_to(kt, 2, _BLOCK)
    v_pad = _pad_to(vt, 2, _BLOCK)
    tq_p, tk_p = q_pad.shape[2], k_pad.shape[2]

    if tq_p != t_q or tk_p != t_k:
        q_seg = (jnp.arange(tq_p) < t_q).astype(jnp.int32)[None].repeat(b, 0)
        kv_seg = (jnp.arange(tk_p) < t_k).astype(jnp.int32)[None].repeat(b, 0)
        seg = _fa.SegmentIds(q=q_seg, kv=kv_seg)
    else:
        seg = None

    # Block sizes tuned on v5e for this model's shapes (large batch*frames,
    # few heads): big q blocks + whole-k tiles + batch blocking beat the
    # kernel defaults by ~3x and the XLA einsum by ~1.5x.
    block_q = min(tq_p, 1024)
    block_k = min(tk_p, 512)
    block_b = min(b, max(1, 2048 // block_q))
    block_sizes = _fa.BlockSizes(
        block_q=block_q,
        block_k_major=block_k,
        block_k=block_k,
        block_b=block_b,
        block_q_major_dkv=block_q,
        block_k_major_dkv=block_k,
        block_k_dkv=block_k,
        block_q_dkv=block_q,
        block_k_major_dq=block_k,
        block_k_dq=block_k,
        block_q_dq=block_q,
    )

    out = _fa.flash_attention(
        q_pad,
        k_pad,
        v_pad,
        segment_ids=seg,
        causal=False,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
    )
    return out[:, :, :t_q].astype(v.dtype)
