"""Single-modality diffusion U-Nets: plain video (3-D stream) and plain
audio (dilated 1-D stream).

The reference's single-modal ``train_util.TrainLoop`` trains models exposing
``video_size`` / ``audio_size`` and previews them via ``save_visual`` /
``save_audio`` (`mm_diffusion/train_util.py:399,:485`); it ships no concrete
single-modal video/audio architecture in-tree.  These modules provide that
capability as the MM-UNet's individual streams uncoupled: the exact per-level
structure of `multimodal_unet.py:799-1001` (channel mults, the exponential
audio-dilation counter, factorized spatial+temporal video attention,
space-only / 4x-length resampling) with the cross-modal attention removed.
All block primitives are shared with the coupled model (`models/layers.py`,
`models/attention.py`).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import FactorizedVideoAttention, TokenSelfAttention
from .layers import (
    AudioConv,
    GroupNormFP32,
    TimeEmbedding,
    VideoConv,
    audio_downsample,
    audio_upsample,
    cat_parts,
    video_downsample,
    video_upsample,
)
from .mm_unet import MAX_DILATION_EXP

Dtype = Any


@dataclasses.dataclass(frozen=True)
class SingleUNetConfig:
    """Config surface for the uncoupled streams.  Field names follow the
    MM-UNet config (multimodal_script_util.py:28-55) minus the cross-modal
    knobs; ``modality`` selects the stream."""

    modality: str = "video"  # "video" | "audio"
    video_size: Tuple[int, int, int, int] = (16, 3, 64, 64)  # (F, C, H, W)
    audio_size: Tuple[int, int] = (1, 25600)  # (C, L)
    model_channels: int = 128
    out_channels: int = 3  # 2x when learn_sigma
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    dropout: float = 0.0
    num_heads: int = 4
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    video_type: str = "2d+1d"
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    dtype: str = "bfloat16"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def sample_shape(self) -> Tuple[int, ...]:
        """Channels-last sample shape (without batch)."""
        if self.modality == "video":
            f, c, h, w = self.video_size
            return (f, h, w, c)
        ca, l = self.audio_size
        return (l, ca)


@dataclasses.dataclass(frozen=True)
class _SpecRB:
    in_ch: int
    out_ch: int
    dilation: int = 1
    attention: bool = False
    up: bool = False
    down: bool = False


def build_single_plan(cfg: SingleUNetConfig):
    """Per-level bookkeeping mirroring the MM-UNet's stream construction
    (multimodal_unet.py:799-1001): the audio-dilation counter increments per
    encoder ResBlock and walks back down through the decoder."""
    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_chans = [ch]
    encoder: List[Tuple[Any, ...]] = [("initial",)]
    ds, dilation = 1, 1
    d2 = lambda d: 2 ** (d % MAX_DILATION_EXP)

    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            encoder.append(
                (_SpecRB(ch, int(mult * mc), dilation=d2(dilation),
                         attention=ds in cfg.attention_resolutions),)
            )
            dilation += 1
            ch = int(mult * mc)
            input_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            encoder.append((_SpecRB(ch, ch, dilation=d2(dilation), down=True),))
            dilation += 1
            input_chans.append(ch)
            ds *= 2

    middle = (
        _SpecRB(ch, ch, dilation=d2(dilation), attention=True),
        _SpecRB(ch, ch, dilation=d2(dilation), attention=True),
    )

    decoder: List[Tuple[Any, ...]] = []
    chans = list(input_chans)
    dilation -= 1
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for block_id in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            specs: List[Any] = [
                _SpecRB(ch + ich, int(mult * mc), dilation=d2(dilation),
                        attention=ds in cfg.attention_resolutions)
            ]
            dilation -= 1
            ch = int(mult * mc)
            if level and block_id == cfg.num_res_blocks:
                if cfg.resblock_updown:
                    specs.append(_SpecRB(ch, ch, dilation=d2(dilation), up=True))
                else:
                    specs.append("upsample")
                ds //= 2
            decoder.append(tuple(specs))
    return tuple(encoder), middle, tuple(decoder)


class SingleResBlock(nn.Module):
    """One stream of MMResBlock (parity: ResBlock, multimodal_unet.py:291-495,
    with the other modality's branch removed)."""

    spec: _SpecRB
    cfg: SingleUNetConfig
    train: bool = False

    @nn.compact
    def __call__(self, x, emb):
        cfg, spec, train = self.cfg, self.spec, self.train
        dt = cfg.compute_dtype
        is_video = cfg.modality == "video"
        gs = cfg.use_checkpoint and train

        def conv(features, kernel, name, zero_init=False, dilation=1):
            if is_video:
                return VideoConv(
                    features, kernel, conv_type=cfg.video_type if kernel == 3 else "3d",
                    zero_init=zero_init, dtype=dt, name=name,
                )
            return AudioConv(
                features, kernel, dilation=dilation, zero_init=zero_init, dtype=dt,
                name=name,
            )

        down = video_downsample if is_video else audio_downsample
        up = video_upsample if is_video else audio_upsample

        # parts stay split through SiLU into the conv (SpatialConvFromParts:
        # the skip concat never materializes, each part's normalize+SiLU
        # chain input-fuses into its kernel-slice conv)
        h = GroupNormFP32(name="norm_in", channel_sum_stats=gs)(x)
        h = jax.tree.map(nn.silu, h)
        h = conv(spec.out_ch, 3, "conv_in", dilation=spec.dilation)(h)

        defer_up = False
        if spec.down:
            h, x = down(h), jax.tree.map(down, x)
        elif spec.up:
            if train and cfg.dropout > 0.0:
                h, x = up(h), jax.tree.map(up, x)
            else:
                # nearest-up commutes exactly with the remaining per-channel
                # ops when dropout is off (see MMResBlock) — run the block
                # tail at low resolution and upsample once at the end.
                defer_up = True

        emb_dim = 2 * spec.out_ch if cfg.use_scale_shift_norm else spec.out_ch
        emb_out = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="emb_proj")(
            nn.silu(emb)
        )
        bshape = (-1,) + (1,) * (h.ndim - 2)
        dropout = nn.Dropout(cfg.dropout, deterministic=not train)
        if cfg.use_scale_shift_norm:
            # FiLM folds into the GN normalize coefficients ([B, C] math;
            # ONE fused pass over the activation — see GroupNormFP32.film)
            film = tuple(jnp.split(emb_out, 2, axis=-1))
            h = GroupNormFP32(name="norm_out", channel_sum_stats=gs)(h, film=film)
            h = dropout(nn.silu(h))
        else:
            h = h + emb_out.reshape(bshape + (emb_out.shape[-1],))
            h = dropout(nn.silu(GroupNormFP32(name="norm_out", channel_sum_stats=gs)(h)))
        h = conv(spec.out_ch, 1, "conv_out", zero_init=True)(h)

        if spec.out_ch == spec.in_ch:
            skip = cat_parts(x)
        else:
            skip = conv(spec.out_ch, 1, "skip")(x)
        out = skip + h
        if defer_up:
            out = up(out)

        if spec.attention:
            if is_video:
                out = FactorizedVideoAttention(
                    spec.out_ch, cfg.num_heads, dtype=dt, gn_sums=gs, name="attn"
                )(out)
            else:
                out = TokenSelfAttention(
                    spec.out_ch, cfg.num_heads, dtype=dt, gn_sums=gs, name="attn"
                )(out)
        return out


class SingleModalUNet(nn.Module):
    """Uncoupled video or audio diffusion U-Net.

    Forward: ``(x, timesteps [B], label=None) -> eps`` with ``x`` channels-last
    (video ``[B,F,H,W,C]``, audio ``[B,L,C]``).
    """

    cfg: SingleUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, label=None, *, train: bool = False):
        cfg = self.cfg
        dt = cfg.compute_dtype
        encoder, middle, decoder = build_single_plan(cfg)
        up = video_upsample if cfg.modality == "video" else audio_upsample

        # time_embed_dim == model_channels, as in the MM-UNet (ref :790)
        emb = TimeEmbedding(
            cfg.model_channels, cfg.model_channels, dtype=dt, name="time_embed"
        )(timesteps)
        if cfg.num_classes is not None:
            assert label is not None
            emb = emb + nn.Embed(
                cfg.num_classes, cfg.model_channels, dtype=dt, param_dtype=jnp.float32,
                name="label_emb",
            )(label)

        h = x.astype(dt)

        # same remat policy/knobs as the coupled model (see mm_unet.py)
        _save = ("attn_out",) if os.environ.get(
            "MMDIFF_SAVE_QKV", "1"
        ) == "0" else ("attn_out", "attn_qkv")
        remat_policy = jax.checkpoint_policies.save_only_these_names(*_save)
        remat_min_tokens = int(os.environ.get("MMDIFF_REMAT_MIN_TOKENS", "4096"))

        def maybe_remat(m, shape):
            if not cfg.use_checkpoint:
                return m
            tokens = 1
            for d in shape[1:-1]:
                tokens *= d
            if tokens < remat_min_tokens:
                return m
            return nn.remat(m, static_argnums=(), policy=remat_policy)

        def run(specs, h, stage, idx):
            for j, spec in enumerate(specs):
                name = f"{stage}_{idx}_{j}"
                if spec == "initial":
                    feat = int(cfg.channel_mult[0] * cfg.model_channels)
                    if cfg.modality == "video":
                        h = VideoConv(
                            feat, 3, conv_type="2d+1d", dtype=dt, name=name + "_conv"
                        )(h)
                    else:
                        h = AudioConv(feat, 3, dtype=dt, name=name + "_conv")(h)
                elif spec == "upsample":
                    h = up(h)
                elif isinstance(spec, _SpecRB):
                    hshape = h[0].shape if isinstance(h, tuple) else h.shape
                    h = maybe_remat(SingleResBlock, hshape)(
                        spec, cfg, train, name=name + "_res"
                    )(h, emb)
                else:
                    raise ValueError(spec)
            return h

        hs = []
        for i, specs in enumerate(encoder):
            h = run(specs, h, "enc", i)
            hs.append(h)
        h = run(middle, h, "mid", 0)
        for i, specs in enumerate(decoder):
            h = (h, hs.pop())  # virtual skip concat (see MMResBlock)
            h = run(specs, h, "dec", i)

        h = nn.silu(
            GroupNormFP32(name="out_norm", channel_sum_stats=cfg.use_checkpoint and train)(h)
        )
        if cfg.modality == "video":
            h = VideoConv(
                cfg.out_channels, 3, conv_type="3d", zero_init=True, dtype=dt,
                name="out_conv",
            )(h)
        else:
            h = AudioConv(cfg.out_channels, 3, zero_init=True, dtype=dt, name="out_conv")(h)
        return h.astype(jnp.float32)
