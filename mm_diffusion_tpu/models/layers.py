"""Shared NN primitives for the coupled audio-video U-Nets.

TPU-native re-design of `mm_diffusion/nn.py` and the conv/resample blocks of
`mm_diffusion/multimodal_unet.py:68-208`.  Key departures from the reference:

* **channels-last layouts** — video ``[B, F, H, W, C]``, audio ``[B, L, C]``
  — so the channel dim rides the TPU lane dimension (128) and convs lower to
  MXU matmuls without transposes.
* **bf16 compute, fp32 islands** — parameters live in fp32; modules compute in
  a configurable ``dtype`` (bf16 by default), while GroupNorm runs in fp32
  exactly as the reference keeps fp32 GroupNorm inside its fp16 torso
  (nn.py:29).
* The reference's factorized "2d+1d" video conv (multimodal_unet.py:91-99,
  implemented there as einops rearranges + Conv2d/Conv1d) becomes two 3-D
  convolutions with kernels ``(1,3,3)`` and ``(3,1,1)`` — identical math, no
  data movement, and XLA fuses the layout handling.
"""

from __future__ import annotations

import math
import jax.numpy as jnp
from flax import linen as nn

Dtype = jnp.dtype

zeros_init = nn.initializers.zeros


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embeddings, [cos | sin] order
    (parity: nn.py:192-210).  Accepts fractional timesteps."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNormFP32(nn.Module):
    """32-group GroupNorm computed in float32 regardless of activation dtype
    (parity: GroupNorm32, nn.py:16-33 — fp32 cast; channels-last layout makes
    the reference's 5-D rearrange unnecessary)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # production channel counts are multiples of 32 (reference contract);
        # smaller test configs fall back to the largest divisor <= num_groups.
        ch = x.shape[-1]
        groups = self.num_groups
        while ch % groups != 0:
            groups //= 2
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class VideoConv(nn.Module):
    """Video convolution over ``[B, F, H, W, C]``.

    ``conv_type``:
      * ``"2d+1d"`` — factorized spatial (1,k,k) then temporal (k,1,1) conv
        (parity: multimodal_unet.py:83-99).
      * ``"3d"``   — one full (k,k,k) conv (parity: :86-87,:101-105).
    Stride is always 1 / SAME padding — up/downsampling is a separate op in
    this architecture, as in the reference.
    """

    features: int
    kernel_size: int = 3
    conv_type: str = "2d+1d"
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kw = dict(
            dtype=self.dtype,
            param_dtype=jnp.float32,
            padding="SAME",
        )
        if self.zero_init:
            kw.update(kernel_init=zeros_init, bias_init=zeros_init)
        if self.conv_type == "2d+1d":
            x = nn.Conv(self.features, kernel_size=(1, k, k), name="spatial", **kw)(x)
            x = nn.Conv(self.features, kernel_size=(k, 1, 1), name="temporal", **kw)(x)
            return x
        if self.conv_type == "3d":
            return nn.Conv(self.features, kernel_size=(k, k, k), name="conv", **kw)(x)
        raise NotImplementedError(self.conv_type)


class AudioConv(nn.Module):
    """Dilated 1-D audio convolution over ``[B, L, C]``
    (parity: multimodal_unet.py:108-131; both '1d' and 'linear' types are a
    Conv1d in the reference, so a single module suffices)."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32, padding="SAME")
        if self.zero_init:
            kw.update(kernel_init=zeros_init, bias_init=zeros_init)
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            name="conv",
            **kw,
        )(x)


def video_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """Space-only 2x average-pool downsample, never time
    (parity: Downsample dims=3 stride (1,2,2), multimodal_unet.py:191-204)."""
    return nn.avg_pool(x, window_shape=(1, 2, 2), strides=(1, 2, 2))


def video_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """Space-only 2x nearest upsample (parity: Upsample dims=3, ref :149-173)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)


def audio_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """4x average-pool downsample over length (parity: dims=1 stride 4, ref :193-204)."""
    return nn.avg_pool(x, window_shape=(4,), strides=(4,))


def audio_upsample(x: jnp.ndarray) -> jnp.ndarray:
    """4x nearest upsample over length (parity: dims=1, ref :152-173)."""
    return jnp.repeat(x, 4, axis=1)


def image_downsample(x: jnp.ndarray) -> jnp.ndarray:
    """2x average-pool for image U-Nets (parity: image_unet Downsample)."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def image_upsample(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class TimeEmbedding(nn.Module):
    """Timestep MLP: sinusoid -> Dense -> SiLU -> Dense
    (parity: multimodal_unet.py:790-795; note time_embed_dim == model_channels
    for the multimodal U-Net, unlike the 4x of the image U-Net)."""

    model_channels: int
    embed_dim: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        h = timestep_embedding(t, self.model_channels)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.silu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return h
