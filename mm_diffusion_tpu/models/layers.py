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
import os

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
    # Formulation switch for the single-array path.  The stock nn.GroupNorm
    # formulation fuses best in a pure FORWARD (stats fold into the producing
    # conv); but under jax.checkpoint its [.., G, C/G] group reshape is
    # lane-hostile (C/G < 128 rides the minor dim) and the rematted backward
    # materializes f32 copy/slice/pad storms around every _stats recompute
    # (profiled: ~50 ms of the b4 train step).  The channel-sum formulation
    # reduces over spatial per channel (lane-parallel) and finishes on tiny
    # [B, G] tensors — same math, no hostile reshape.  Model code sets
    # ``channel_sum_stats=True`` under remat/training.
    channel_sum_stats: bool = False
    # >1 treats the channel dim as ``phase_channels`` repeated blocks of the
    # REAL channels (SubpixelUpConv's flat phase layout [B, H, W, 4*C]):
    # stats aggregate over phases (the interleave is a spatial permutation,
    # so normalizing before or after it is exactly the same math) and the
    # [B, C] coefficients tile across the blocks.  Params stay [C] —
    # checkpoints are unaffected.
    phase_channels: int = 1

    @nn.compact
    def __call__(self, x, film=None):
        """``film=(scale, shift)`` ([B, C] each) folds the FiLM affine
        ``y * (1 + scale) + shift`` (use_scale_shift_norm's emb injection)
        into the normalize coefficients: the per-channel math happens on
        tiny [B, C] tensors and the big activation sees ONE fused
        multiply-add pass instead of normalize-then-FiLM — under remat the
        backward then rematerializes one pass, not two."""
        parts = x if isinstance(x, tuple) else (x,)
        ch = sum(p.shape[-1] for p in parts)
        pc = self.phase_channels
        if pc > 1:
            assert not isinstance(x, tuple) and ch % pc == 0, (ch, pc)
            ch //= pc
        groups = self.num_groups
        # production channel counts are multiples of 32 (reference contract);
        # smaller test configs fall back to the largest divisor <= num_groups.
        while ch % groups != 0:
            groups //= 2
        scale, bias = _GNParams(ch, name="GroupNorm_0")()

        force_sums = (
            self.channel_sum_stats
            or os.environ.get("MMDIFF_GN_SUMS", "") == "1"
        )
        if not isinstance(x, tuple) and not force_sums and pc == 1:
            # Single-array forward fast path: the stock nn.GroupNorm
            # formulation — XLA fuses its stats into the producing conv and
            # its normalize into the consuming conv (profiled; the manual
            # formulation below breaks that operand fusion and costs an
            # extra pass per GN in a forward-only eval).
            y = nn.GroupNorm(
                num_groups=groups,
                epsilon=1e-5,
                dtype=jnp.float32,
                param_dtype=jnp.float32,
                use_bias=False,
                use_scale=False,
                name="_stats",  # param-less (scale/bias live in _GNParams)
            )(x.astype(jnp.float32))
            eff_s, eff_b = scale, bias
            if film is not None:
                fs, fb = film
                bshape = (x.shape[0],) + (1,) * (x.ndim - 2) + (ch,)
                eff_s = (scale * (1.0 + fs.astype(jnp.float32))).reshape(bshape)
                eff_b = (
                    bias * (1.0 + fs.astype(jnp.float32)) + fb.astype(jnp.float32)
                ).reshape(bshape)
            return (y * eff_s + eff_b).astype(x.dtype)

        b = parts[0].shape[0]
        red = tuple(range(1, parts[0].ndim - 1))
        n = (ch // groups) * pc
        for d in red:
            n *= parts[0].shape[d]

        csum = jnp.concatenate(
            [jnp.sum(p.astype(jnp.float32), axis=red) for p in parts], axis=-1
        )  # [B, C] ([B, pc*C] in phase layout)
        csumsq = jnp.concatenate(
            [jnp.sum(jnp.square(p.astype(jnp.float32)), axis=red) for p in parts],
            axis=-1,
        )
        if pc > 1:  # fold the phase blocks: stats are phase-invariant
            csum = csum.reshape(b, pc, ch).sum(1)
            csumsq = csumsq.reshape(b, pc, ch).sum(1)
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
        if film is not None:  # fold FiLM on the tiny [B, C] coefficients
            fs, fb = film
            cs_all = cs_all * (1.0 + fs.astype(jnp.float32))
            cb_all = cb_all * (1.0 + fs.astype(jnp.float32)) + fb.astype(jnp.float32)
        if pc > 1:  # tile the [B, C] coefficients across the phase blocks
            cs_all = jnp.tile(cs_all, (1, pc))
            cb_all = jnp.tile(cb_all, (1, pc))
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
        return tuple(outs) if isinstance(x, tuple) else outs[0]


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


class SpatialConvFromParts(nn.Module):
    """k-tap SAME convolution over a tuple of channel parts.

    ``conv(concat(parts))`` distributes over input-channel slices of the
    kernel, so the decoder's skip concatenation never materializes: each
    part is convolved against its kernel slice and the partials are summed
    (the add + bias ride the last convolution's epilogue).

    The fusion rationale goes beyond skipping the concat write: a concat has
    TWO producers, so XLA materializes it and the GroupNorm-normalize + SiLU
    chains feeding it stay standalone elementwise passes (profiled ~3.2 ms
    per 256^2 decoder ResBlock of the SR U-Net).  Split per part, each
    normalize+SiLU chain is the single producer of its convolution's input
    and XLA input-fuses it into the conv — the bandwidth hides under the
    MXU time.  Param names/shapes match the ``nn.Conv`` this replaces
    ("kernel" [*k, Ci_total, Co], "bias" [Co]) so checkpoints and the torch
    importer are unaffected.
    """

    features: int
    kernel_size: Tuple[int, ...]
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16
    kernel_dilation: Optional[Tuple[int, ...]] = None

    @nn.compact
    def __call__(self, parts):
        parts = parts if isinstance(parts, tuple) else (parts,)
        nd = len(self.kernel_size)
        assert all(p.ndim == nd + 2 for p in parts), [p.shape for p in parts]
        in_features = sum(p.shape[-1] for p in parts)
        kinit = zeros_init if self.zero_init else nn.initializers.lecun_normal()
        kernel = self.param(
            "kernel", kinit, (*self.kernel_size, in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", zeros_init, (self.features,), jnp.float32)
        sp = "DHW"[3 - nd:]
        dn = (f"N{sp}C", f"{sp}IO", f"N{sp}C")
        out = None
        off = 0
        for p in parts:
            ci = p.shape[-1]
            wi = jax.lax.slice_in_dim(kernel, off, off + ci, axis=nd)
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype), wi.astype(self.dtype), (1,) * nd, "SAME",
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=dn,
            )
            out = y if out is None else out + y
            off += ci
        assert off == in_features, (off, in_features)
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
        if isinstance(x, tuple) and len(x) == 1:
            x = x[0]
        if isinstance(x, tuple):  # virtual-concat parts (decoder skip)
            if k == 1 and self.conv_type == "3d":
                return PointwiseFromParts(
                    self.features,
                    sum(p.shape[-1] for p in x),
                    lead_ones=3,
                    zero_init=self.zero_init,
                    dtype=self.dtype,
                    name="conv",
                )(x)
            if self.conv_type == "2d+1d":
                # spatial stage per part (each part's normalize+SiLU chain
                # input-fuses into its own conv, the concat never
                # materializes — see SpatialConvFromParts); the temporal
                # stage runs on the sum.
                h = SpatialConvFromParts(
                    self.features, (1, k, k), zero_init=self.zero_init,
                    dtype=self.dtype, name="spatial",
                )(x)
                kw = dict(dtype=self.dtype, param_dtype=jnp.float32, padding="SAME")
                if self.zero_init:
                    kw.update(kernel_init=zeros_init, bias_init=zeros_init)
                return nn.Conv(
                    self.features, kernel_size=(k, 1, 1), name="temporal", **kw
                )(h)
            x = cat_parts(x)  # full-3d k>1: plain concat path below
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
        if isinstance(x, tuple) and len(x) == 1:
            x = x[0]
        if isinstance(x, tuple):  # virtual-concat parts (decoder skip)
            if self.kernel_size == 1:
                return PointwiseFromParts(
                    self.features,
                    sum(p.shape[-1] for p in x),
                    lead_ones=1,
                    zero_init=self.zero_init,
                    dtype=self.dtype,
                    name="conv",
                )(x)
            return SpatialConvFromParts(
                self.features, (self.kernel_size,), zero_init=self.zero_init,
                dtype=self.dtype, kernel_dilation=(self.dilation,), name="conv",
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


class SubpixelUpConv(nn.Module):
    """``conv3x3(nearest_up2(x))`` computed at LOW resolution — exact rewrite.

    Nearest 2x replication collapses the 3x3 taps of each hi-res output
    phase ``(a, b) in {0,1}^2`` onto low-res taps:

      rows, phase a=0 (hi taps 2i-1, 2i, 2i+1 -> low i-1, i, i):
            [w0, w1+w2, 0]
      rows, phase a=1 (hi taps 2i, 2i+1, 2i+2 -> low i, i, i+1):
            [0, w0+w1, w2]          (columns identical)

    Writing each phase's collapsed 2-tap window at its own offset inside a
    FULL 3x3 low-res footprint makes all four phases share one aligned
    window, so a single SAME 3x3 conv with ``4*Co`` output channels computes
    everything: the MXU sees N = 4*Co (e.g. 768 = 6 full lane tiles where Co
    = 192 alone would pad 192 -> 256, a 25% N tax), the 4x nearest-up
    intermediate never touches HBM, and the finish is a plain depth-to-space
    (one elementwise interleave that fuses into the consumer).  The earlier
    2x2-VALID formulation had fewer MACs (16 vs 36 per hi-res pixel) but its
    four phase outputs lived at *offset* windows — the overlapping-slice
    re-interleave cost ~7 ms/eval at the SR U-Net's 256^2 site (r4 profile),
    swamping the MAC saving; 36 aligned MACs at 100% N-efficiency beat 16
    offset MACs at 75%.

    Param names/shapes match the ``nn.Conv(features, (3,3))`` it replaces
    ("kernel" [3,3,Ci,Co], "bias" [Co]) so checkpoints and the torch
    importer are unaffected.  Used by the image U-Net up blocks
    (parity: image ResBlock h_upd + in_layers conv, guided-diffusion order;
    the reference computes the same values at 4x the pixels).
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    # False returns the FLAT phase layout [B, H, W, 4*Co] (phase-major
    # (a, b) channel blocks — the conv's own output, untouched) so
    # pointwise/phase-permutation-invariant consumers (GroupNorm with
    # phase_channels=4, FiLM, SiLU) run BEFORE the interleave in the conv's
    # natural layout; the depth-to-space then happens once, in bf16, via
    # subpixel_interleave() right where spatial layout is first required.
    # (A 5-D [B, H, W, 2, 2, Co] view here made XLA's layout assignment pick
    # a W-minor layout for the whole normalize region — profiled ~5 ms/eval
    # of fp32 relayout copies at the SR U-Net's 256^2 up block.  The flat
    # form keeps the standard C-minor layout end to end.)
    interleave: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bsz, h, w, ci = x.shape
        co = self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci, co), jnp.float32
        )
        bias = self.param("bias", zeros_init, (co,), jnp.float32)

        # Phase-collapse matrix P[a][u, t]: footprint row u of phase a reads
        # original tap t (same matrix for columns).
        p = jnp.asarray(
            [[[1, 0, 0], [0, 1, 1], [0, 0, 0]],
             [[0, 0, 0], [1, 1, 0], [0, 0, 1]]],
            jnp.float32,
        )
        # k3[u, v, ci, (a, b, co)] = sum_{t,s} P[a][u,t] P[b][v,s] K[t,s]
        k3 = jnp.einsum("aut,bvs,tsio->uvabio", p, p, kernel)
        k3 = k3.reshape(3, 3, 4, ci, co).transpose(0, 1, 3, 2, 4)
        k3 = k3.reshape(3, 3, ci, 4 * co).astype(self.dtype)

        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k3, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [B, H, W, 4*Co], phase-major channel blocks (a, b)
        y = y + jnp.tile(bias, 4).astype(self.dtype)
        if not self.interleave:
            return y
        return subpixel_interleave(y)


def subpixel_interleave(y: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4*Co] flat phase layout (phase-major (a, b) channel blocks)
    -> [B, 2H, 2W, Co] (phase (a, b) lands at hi-res pixel (2i+a, 2j+b));
    the depth-to-space finish of SubpixelUpConv.

    Layout note (r5 A/B): the six-dim transpose below profiles as a ~1.2 ms
    pre-copy + ~1.45 ms transpose at the SR 256^2 site, vs a ~1.5 ms
    single-transpose standalone floor.  Re-expressing it with a contiguous
    [2*Co] minor unit ([B,H,W,2,2Co] -> [B,H,2,W,2Co]) looked layout-free
    on paper but LOST ~3.8 ms in-model: the surrounding reshapes merge
    across TPU tile boundaries and materialize as two ~1.5 ms copies, and
    the consumer conv slowed 0.9 ms (tools/bench_d2s.py + profile)."""
    bsz, h, w, c4 = y.shape
    co = c4 // 4
    out = y.reshape(bsz, h, w, 2, 2, co)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(bsz, 2 * h, 2 * w, co)


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
