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
import jax
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


class _GNParams(nn.Module):
    """Scale/bias holder named to match the param tree of the nn.GroupNorm
    this module replaced (checkpoints and the torch importer address
    ``GroupNorm_0/{scale,bias}``)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return scale, bias


class GroupNormFP32(nn.Module):
    """32-group GroupNorm with float32 statistics over bf16 activations
    (parity: GroupNorm32, nn.py:16-33).

    Stats are computed as per-channel float32 sums reduced over the spatial
    axes (lane-parallel; the convert fuses into the reduce) and combined into
    group moments on tiny ``[B, G]`` tensors — the naive ``[.., G, C/G]``
    reshape makes the group reduce lane-crossing and forces an fp32
    materialization of the activation.

    Accepts either one array or a TUPLE of channel-concatenated parts (the
    U-Net decoder's skip concatenation): per-channel sums are additive, so
    the parts are normalized *as if concatenated* without ever materializing
    the concat — the caller concatenates (or not) downstream where XLA can
    fuse it into the next elementwise producer.
    """

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, tuple) else (x,)
        ch = sum(p.shape[-1] for p in parts)
        groups = self.num_groups
        # production channel counts are multiples of 32 (reference contract);
        # smaller test configs fall back to the largest divisor <= num_groups.
        while ch % groups != 0:
            groups //= 2
        scale, bias = _GNParams(ch, name="GroupNorm_0")()

        if not isinstance(x, tuple):
            # Single-array fast path: the stock nn.GroupNorm formulation —
            # XLA fuses its stats into the producing conv and its normalize
            # into the consuming conv (profiled; the manual formulation below
            # breaks that operand fusion and costs an extra pass per GN).
            y = nn.GroupNorm(
                num_groups=groups,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                use_bias=False,
                use_scale=False,
                name="_stats",  # param-less (scale/bias live in _GNParams)
            )(x.astype(jnp.float32))
            return (y * scale + bias).astype(x.dtype)

        b = parts[0].shape[0]
        red = tuple(range(1, parts[0].ndim - 1))
        n = ch // groups
        for d in red:
            n *= parts[0].shape[d]

        csum = jnp.concatenate(
            [jnp.sum(p.astype(jnp.float32), axis=red) for p in parts], axis=-1
        )  # [B, C]
        csumsq = jnp.concatenate(
            [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=red) for p in parts],
            axis=-1,
        )
        gsum = csum.reshape(b, groups, -1).sum(-1)
        gsumsq = csumsq.reshape(b, groups, -1).sum(-1)
        mean = gsum / n
        # clamp: E[x^2]-E[x]^2 can go slightly negative from fp32 roundoff
        # on near-constant groups (flax's _compute_stats does the same clip)
        var = jnp.maximum(gsumsq / n - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + 1e-5)
        cpg = ch // groups
        mean_c = jnp.repeat(mean, cpg, axis=-1)  # [B, C]
        rstd_c = jnp.repeat(rstd, cpg, axis=-1)
        # y = (x - mean) * rstd * scale + bias == x * cs + cb
        cs_all = rstd_c * scale
        cb_all = bias - mean_c * cs_all
        shape = (b,) + (1,) * (parts[0].ndim - 2)

        outs = []
        off = 0
        for p in parts:
            w = p.shape[-1]
            cs = cs_all[:, off : off + w].reshape(*shape, w)
            cb = cb_all[:, off : off + w].reshape(*shape, w)
            # fp32 elementwise math (converts fuse into the pass; HBM traffic
            # stays bf16), cast back to the activation dtype on the way out.
            outs.append((p.astype(jnp.float32) * cs + cb).astype(p.dtype))
            off += w
        return tuple(outs)


def cat_parts(x):
    """Materialize a virtual-concat tuple (no-op for plain arrays).  The
    concat sits next to its elementwise consumer so XLA fuses it there."""
    if not isinstance(x, tuple):
        return x
    return x[0] if len(x) == 1 else jnp.concatenate(x, axis=-1)


class PointwiseFromParts(nn.Module):
    """Channel-mixing 1x1 convolution over a tuple of channel parts.

    ``conv(concat(parts))`` distributes over channel slices of the kernel, so
    the decoder's skip concatenation never materializes in HBM — each part is
    matmul'd against its kernel slice and the partials are summed (XLA fuses
    the adds into the second matmul).  The kernel keeps the leading 1-dims of
    the nn.Conv it replaces so checkpoints and the torch importer see an
    identical param tree."""

    features: int
    in_features: int
    lead_ones: int
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, parts):
        kshape = (1,) * self.lead_ones + (self.in_features, self.features)
        kinit = zeros_init if self.zero_init else nn.initializers.lecun_normal()
        binit = zeros_init
        kernel = self.param("kernel", kinit, kshape, jnp.float32)
        bias = self.param("bias", binit, (self.features,), jnp.float32)
        w = kernel.reshape(self.in_features, self.features).astype(self.dtype)
        out = None
        off = 0
        for p in parts:
            ci = p.shape[-1]
            # 1x1 conv_general (not dot_general) keeps the operand/result in
            # XLA's conv layout — the dot formulation forced relayout copies
            # next to every neighboring 3x3 conv (profiled round 2) — and
            # the partial add fuses into the second conv's epilogue.
            sp = "DHW"[3 - (p.ndim - 2) :]
            dn = (f"N{sp}C", f"{sp}IO", f"N{sp}C")
            wi = w[off : off + ci].reshape((1,) * (p.ndim - 2) + (ci, self.features))
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype), wi, (1,) * (p.ndim - 2), "VALID",
                dimension_numbers=dn,
            )
            out = y if out is None else out + y
            off += ci
        assert off == self.in_features, (off, self.in_features)
        return out + bias.astype(self.dtype)


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
        if isinstance(x, tuple):  # virtual-concat parts, pointwise only
            assert k == 1 and self.conv_type == "3d"
            return PointwiseFromParts(
                self.features,
                sum(p.shape[-1] for p in x),
                lead_ones=3,
                zero_init=self.zero_init,
                dtype=self.dtype,
                name="conv",
            )(x)
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
        if isinstance(x, tuple):  # virtual-concat parts, pointwise only
            assert self.kernel_size == 1
            return PointwiseFromParts(
                self.features,
                sum(p.shape[-1] for p in x),
                lead_ones=1,
                zero_init=self.zero_init,
                dtype=self.dtype,
                name="conv",
            )(x)
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
    """Space-only 2x nearest upsample (parity: Upsample dims=3, ref :149-173).
    Single broadcast+reshape — chained jnp.repeat materializes twice."""
    b, f, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, f, h, 2, w, 2, c))
    return y.reshape(b, f, 2 * h, 2 * w, c)


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
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


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
