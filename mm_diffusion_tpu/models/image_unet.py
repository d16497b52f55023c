"""Guided-diffusion style image U-Net + super-resolution variant.

TPU-native re-design of `mm_diffusion/image_unet.py:395-716` (the 64->256
frame upsampler used by the SR sampling chain).  Channels-last ``[B,H,W,C]``,
bf16 compute / fp32 params, same structural bookkeeping as the reference so
published guided-diffusion checkpoints can be weight-converted 1:1.

Differences vs. the multimodal ResBlock worth noting (both match their
respective references): here ``time_embed_dim = 4*model_channels``
(image_unet.py:469) and the up/down ResBlock resamples *between* norm-SiLU
and the first conv (image_unet.py:240-246), whereas the MM block resamples
after its full in_layers stack.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import TokenSelfAttention
from .layers import (
    GroupNormFP32,
    SpatialConvFromParts,
    SubpixelUpConv,
    TimeEmbedding,
    cat_parts,
    image_downsample,
    image_upsample,
    subpixel_interleave,
)

Dtype = Any
zeros_init = nn.initializers.zeros


@dataclasses.dataclass(frozen=True)
class ImageUNetConfig:
    """Mirrors ImageUnet's constructor surface (image_unet.py:427-468)."""

    image_size: int = 64
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16, 32)
    dropout: float = 0.0
    channel_mult: Tuple[float, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_checkpoint: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def heads(self, ch: int, upsample: bool = False) -> int:
        """(parity: AttentionBlock head selection, image_unet.py:268-276)"""
        if self.num_head_channels == -1:
            if upsample and self.num_heads_upsample != -1:
                return self.num_heads_upsample
            return self.num_heads
        assert ch % self.num_head_channels == 0
        return ch // self.num_head_channels


class ImageResBlock(nn.Module):
    """(parity: ResBlock, image_unet.py:142-255)"""

    in_ch: int
    out_ch: int
    cfg: ImageUNetConfig
    up: bool = False
    down: bool = False
    # train lives on the module (not the call) so nn.remat sees only array
    # arguments — a traced bool would break the dropout determinism switch.
    train: bool = False

    @nn.compact
    def __call__(self, x, emb):
        # ``x`` may be a tuple of channel parts (decoder skip concat) — the
        # concat is virtual: GroupNormFP32 normalizes parts jointly, the
        # concat fuses into the SiLU producers, and the skip projection mixes
        # parts with kernel slices (PointwiseFromParts).
        cfg = self.cfg
        dt = cfg.compute_dtype
        conv_kw = dict(dtype=dt, param_dtype=jnp.float32, padding="SAME")

        # channel-sum GN only under remat AND training: eval forwards fuse
        # better with the stock formulation (see layers.GroupNormFP32).
        gs = cfg.use_checkpoint and self.train
        h = GroupNormFP32(name="norm_in", channel_sum_stats=gs)(x)
        h = jax.tree.map(nn.silu, h)
        if self.down:
            # only h pools eagerly — the skip path's pool happens as a mean
            # in the split-pixel view of the residual add (see below), so no
            # standalone reduce_window pass runs for x (profiled ~1 ms at
            # the SR U-Net's 256^2 encoder level).
            h = jax.tree.map(image_downsample, h)
        elif self.up:
            # Exact upsample+conv fusion: the 3x3 conv over the nearest-2x
            # image runs as an aligned phase conv at LOW resolution (no 4x
            # intermediate in HBM, 4*Co fills the MXU N dim).  Same params
            # as the nn.Conv below — checkpoints are unaffected.  The output
            # stays in the FLAT phase layout [B, H, W, 4*Co] through
            # norm_out (phase_channels=4) / FiLM / SiLU — all exactly
            # phase-invariant — and the one bf16 depth-to-space happens
            # right before conv_out, where spatial layout is first needed.
            # x is NOT upsampled: nearest-up of the skip is a broadcast in
            # the split-pixel view of the residual add (below), so the 4x
            # skip intermediate never touches HBM.
            h = SubpixelUpConv(
                self.out_ch, dtype=dt, interleave=False, name="conv_in"
            )(cat_parts(h))
        if not self.up:
            # Split over channel parts: each part's normalize+SiLU chain
            # input-fuses into its own convolution (see SpatialConvFromParts)
            h = SpatialConvFromParts(
                self.out_ch, (3, 3), dtype=dt, name="conv_in"
            )(h)

        emb_dim = 2 * self.out_ch if cfg.use_scale_shift_norm else self.out_ch
        emb_out = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="emb_proj")(
            nn.silu(emb)
        )
        dropout = nn.Dropout(cfg.dropout, deterministic=not self.train)
        pc = 4 if self.up else 1  # flat phase layout until the interleave
        if cfg.use_scale_shift_norm:
            # FiLM folds into the GN normalize coefficients ([B, C] math;
            # ONE fused pass over the activation — see GroupNormFP32.film)
            film = tuple(jnp.split(emb_out, 2, axis=-1))
            h = GroupNormFP32(
                name="norm_out", channel_sum_stats=gs, phase_channels=pc
            )(h, film=film)
            h = dropout(nn.silu(h))
        else:
            bcast = (slice(None),) + (None,) * (h.ndim - 2)  # [B, 1..., C]
            h = h + (jnp.tile(emb_out, (1, pc)) if pc > 1 else emb_out)[bcast]
            h = dropout(nn.silu(GroupNormFP32(
                name="norm_out", channel_sum_stats=gs, phase_channels=pc
            )(h)))
        if self.up:
            h = subpixel_interleave(h)
        h = nn.Conv(
            self.out_ch, (3, 3), kernel_init=zeros_init, bias_init=zeros_init,
            name="conv_out", **conv_kw,
        )(h)

        if self.out_ch == self.in_ch:
            skip = cat_parts(x)
        else:
            from .layers import PointwiseFromParts

            # up/down blocks project at the ORIGINAL resolution — a 1x1 conv
            # commutes exactly with both nearest-up (per-pixel) and 2x2
            # avg-pool (linear); for up blocks that is also 4x fewer pixels.
            parts = x if isinstance(x, tuple) else (x,)
            skip = PointwiseFromParts(
                self.out_ch,
                sum(p.shape[-1] for p in parts),
                lead_ones=2,
                dtype=dt,
                name="skip",
            )(parts)
        if self.up:
            # nearest-up(skip) + h, fused: broadcast the low-res skip in the
            # split-pixel view [B, H/2, 2, W/2, 2, C] of h — one elementwise
            # pass, bitcast reshapes on both sides.
            b, hh, ww, c = h.shape
            h5 = h.reshape(b, hh // 2, 2, ww // 2, 2, c)
            out = h5 + skip[:, :, None, :, None, :].astype(h5.dtype)
            return out.reshape(b, hh, ww, c)
        if self.down:
            # avg-pool(skip) + h.  reduce_window beats the split-pixel
            # mean-over-middle-axes formulation on TPU (r5 A/B at the SR
            # 256^2 site, tools/bench_d2s.py: 1.25 vs 1.67 ms standalone,
            # 1.9 ms in-model for the strided reduce).
            return image_downsample(skip).astype(h.dtype) + h
        return skip + h


class ImageAttention(nn.Module):
    """Spatial self-attention on [B,H,W,C] (parity: AttentionBlock,
    image_unet.py:258-324)."""

    channels: int
    num_heads: int
    dtype: Dtype = jnp.bfloat16
    gn_sums: bool = False

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = TokenSelfAttention(
            self.channels, self.num_heads, dtype=self.dtype, gn_sums=self.gn_sums
        )(tokens)
        return tokens.reshape(b, h, w, c)


@dataclasses.dataclass(frozen=True)
class _RB:
    in_ch: int
    out_ch: int
    attn_heads: int = 0  # 0 = no attention after this block
    up: bool = False
    down: bool = False


def build_image_plan(cfg: ImageUNetConfig):
    """(parity: ImageUnet constructor bookkeeping, image_unet.py:478-624)"""
    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_chans = [ch]
    encoder: List[Tuple[Any, ...]] = [("initial",)]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            heads = cfg.heads(int(mult * mc)) if ds in cfg.attention_resolutions else 0
            encoder.append((_RB(ch, int(mult * mc), attn_heads=heads),))
            ch = int(mult * mc)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            if cfg.resblock_updown:
                encoder.append((_RB(ch, ch, down=True),))
            else:
                encoder.append(("downsample",))
            input_chans.append(ch)
            ds *= 2

    middle = (_RB(ch, ch, attn_heads=cfg.heads(ch)), _RB(ch, ch))

    decoder: List[Tuple[Any, ...]] = []
    chans = list(input_chans)
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            heads = (
                cfg.heads(int(mult * mc), upsample=True)
                if ds in cfg.attention_resolutions
                else 0
            )
            specs: List[Any] = [_RB(ch + ich, int(mult * mc), attn_heads=heads)]
            ch = int(mult * mc)
            if level and i == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    specs.append(_RB(ch, ch, up=True))
                else:
                    specs.append("upsample")
                ds //= 2
            decoder.append(tuple(specs))
    return tuple(encoder), middle, tuple(decoder), ch


class ImageUNet(nn.Module):
    """(parity: ImageUnet, image_unet.py:395-697; forward :700-715 for SR)"""

    cfg: ImageUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, label=None, *, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        encoder, middle, decoder, out_ch = build_image_plan(cfg)

        emb = TimeEmbedding(
            cfg.model_channels, cfg.model_channels * 4, dtype=dt, name="time_embed"
        )(timesteps)
        if cfg.num_classes is not None:
            assert label is not None
            emb = emb + nn.Embed(
                cfg.num_classes, cfg.model_channels * 4, dtype=dt,
                param_dtype=jnp.float32, name="label_emb",
            )(label)

        h = x.astype(dt)
        conv_kw = dict(dtype=dt, param_dtype=jnp.float32, padding="SAME")

        # Selective remat for training memory (parity: the reference's
        # use_checkpoint flag wraps every ResBlock, image_unet.py ResBlock
        # forward via CheckpointFunction).  Only blocks whose activation
        # token count (H*W here; F*H*W in MultimodalUNet — 'tokens' = rows
        # of the [tokens, C] activation) clears the threshold pay the
        # recompute — low-res blocks hold tiny activations, so saving them
        # costs little HBM and skips a full block recompute in the backward.
        # Same knobs as MultimodalUNet: MMDIFF_REMAT_MIN_TOKENS,
        # MMDIFF_SAVE_QKV=0 for HBM-bound configs.
        remat_min_tokens = int(os.environ.get("MMDIFF_REMAT_MIN_TOKENS", "4096"))
        _save = ("attn_out",) if os.environ.get(
            "MMDIFF_SAVE_QKV", "1"
        ) == "0" else ("attn_out", "attn_qkv")
        remat_policy = jax.checkpoint_policies.save_only_these_names(*_save)

        def maybe_remat(m, pixels):
            if not cfg.use_checkpoint or pixels < remat_min_tokens:
                return m
            return nn.remat(m, static_argnums=(), policy=remat_policy)

        def run(specs, h, stage, idx):
            for j, spec in enumerate(specs):
                name = f"{stage}_{idx}_{j}"
                if spec == "initial":
                    h = nn.Conv(
                        int(cfg.channel_mult[0] * cfg.model_channels), (3, 3),
                        name=name + "_conv", **conv_kw,
                    )(h)
                elif spec == "downsample":
                    if cfg.conv_resample:
                        # torch Downsample pads 1 symmetric (image_unet.py:
                        # conv_nd(..., 3, stride=2, padding=1)); flax "SAME"
                        # would pad (0, 1) at stride 2 — different pixels.
                        h = nn.Conv(
                            h.shape[-1], (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)),
                            dtype=dt, param_dtype=jnp.float32,
                            name=name + "_down",
                        )(h)
                    else:
                        h = image_downsample(h)
                elif spec == "upsample":
                    if cfg.conv_resample:
                        # upsample+conv fused at low res (exact, see layers)
                        h = SubpixelUpConv(h.shape[-1], dtype=dt, name=name + "_up")(h)
                    else:
                        h = image_upsample(h)
                elif isinstance(spec, _RB):
                    hshape = h[0].shape if isinstance(h, tuple) else h.shape
                    block = maybe_remat(ImageResBlock, hshape[1] * hshape[2])(
                        spec.in_ch, spec.out_ch, cfg, up=spec.up, down=spec.down,
                        train=train, name=name + "_res",
                    )
                    h = block(h, emb)
                    if spec.attn_heads:
                        h = ImageAttention(
                            spec.out_ch, spec.attn_heads, dtype=dt,
                            gn_sums=cfg.use_checkpoint and train,
                            name=name + "_attn",
                        )(h)
                else:
                    raise ValueError(spec)
            return h

        hs = []
        for i, specs in enumerate(encoder):
            h = run(specs, h, "enc", i)
            hs.append(h)
        h = run(middle, h, "mid", 0)
        for i, specs in enumerate(decoder):
            # virtual concat — consumed by the entry's leading ResBlock
            h = (h, hs.pop())
            h = run(specs, h, "dec", i)

        h = nn.silu(
            GroupNormFP32(name="out_norm", channel_sum_stats=cfg.use_checkpoint and train)(h)
        )
        h = nn.Conv(
            cfg.out_channels, (3, 3), kernel_init=zeros_init, bias_init=zeros_init,
            name="out_conv", **conv_kw,
        )(h)
        return h.astype(jnp.float32)


class ImageSuperResModel(nn.Module):
    """SR variant: bilinearly upsample ``low_res`` and concat on channels
    (parity: ImageSuperResModel, image_unet.py:700-715; note in_channels is
    doubled in the wrapped config)."""

    cfg: ImageUNetConfig  # cfg.in_channels already includes the low_res concat

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, label=None, *, train: bool = False):
        b, h, w, c = x.shape
        upsampled = jax.image.resize(low_res, (b, h, w, low_res.shape[-1]), "bilinear")
        x = jnp.concatenate([x, upsampled.astype(x.dtype)], axis=-1)
        return ImageUNet(self.cfg, name="unet")(x, timesteps, label=label, train=train)
