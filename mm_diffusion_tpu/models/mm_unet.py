"""The coupled multi-modal U-Net (video 3-D stream + audio 1-D stream with
RS-MMA cross-modal coupling).

TPU-native re-design of `mm_diffusion/multimodal_unet.py:291-1101`.  The
structure (level/channel/dilation bookkeeping) is reproduced from the
reference's constructor so checkpoints map 1:1, but the execution model is
flax/XLA-native: channels-last, bf16 compute with fp32 params, optional
`jax.checkpoint` rematerialisation per block (replacing the reference's
custom CheckpointFunction, nn.py:233-279).

Config field names and defaults mirror `multimodal_script_util.py:28-55` so
the reference CLI surface maps directly.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import FactorizedVideoAttention, RSMMACrossAttention, TokenSelfAttention
from .layers import (
    AudioConv,
    GroupNormFP32,
    TimeEmbedding,
    VideoConv,
    audio_downsample,
    cat_parts,
    audio_upsample,
    video_downsample,
    video_upsample,
)

Dtype = Any


# ---------------------------------------------------------------------------
# Config + structural plan
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MMUNetConfig:
    """Mirrors the reference model config surface
    (multimodal_script_util.py:28-55 + multimodal_unet.py:737-764)."""

    video_size: Tuple[int, int, int, int] = (16, 3, 64, 64)  # (F, C, H, W)
    audio_size: Tuple[int, int] = (1, 25600)  # (C, L)
    model_channels: int = 128
    video_out_channels: int = 3  # 6 when learn_sigma
    audio_out_channels: int = 1  # 2 when learn_sigma
    num_res_blocks: int = 2
    cross_attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    cross_attention_windows: Tuple[int, ...] = (1, 4, 8)
    cross_attention_shift: bool = True
    video_attention_resolutions: Tuple[int, ...] = (2, 4, 8)
    audio_attention_resolutions: Tuple[int, ...] = (-1,)
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    dropout: float = 0.0
    num_heads: int = 4
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    video_type: str = "2d+1d"
    audio_type: str = "1d"
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    dtype: str = "bfloat16"  # compute dtype

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    def cross_heads(self, ch: int) -> int:
        """Cross-attn heads obey num_head_channels; self-attn blocks in the
        reference always receive num_head_channels=-1 and use num_heads
        (multimodal_unet.py:409-419 vs :835-842)."""
        if self.num_head_channels == -1:
            return self.num_heads
        assert ch % self.num_head_channels == 0
        return ch // self.num_head_channels


@dataclasses.dataclass(frozen=True)
class ResBlockSpec:
    in_ch: int
    out_ch: int
    audio_dilation: int
    video_attention: bool = False
    audio_attention: bool = False
    up: bool = False
    down: bool = False


@dataclasses.dataclass(frozen=True)
class CrossAttnSpec:
    ch: int
    heads: int
    local_window: int
    window_shift: bool


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    """Static structural plan: lists of layer specs per U-Net stage."""

    encoder: Tuple[Tuple[Any, ...], ...]  # one tuple of specs per input block
    middle: Tuple[Any, ...]
    decoder: Tuple[Tuple[Any, ...], ...]
    skip_channels: Tuple[int, ...]
    out_ch: int


MAX_DILATION_EXP = 10  # audio conv dilation cycles 2^(i % 10) (ref :805,:821)


def build_plan(cfg: MMUNetConfig) -> UNetPlan:
    """Reproduce the reference constructor's structural bookkeeping
    (multimodal_unet.py:799-1001): channel mults, the global audio-dilation
    counter (incremented per encoder ResBlock, decremented through the
    decoder), cross-attention placement by downsample rate, and skip wiring."""
    mc = cfg.model_channels
    ch = int(cfg.channel_mult[0] * mc)
    input_block_chans = [ch]
    encoder: List[Tuple[Any, ...]] = [("initial",)]

    ds = 1
    dilation = 1

    def d2(d):
        return 2 ** (d % MAX_DILATION_EXP)

    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            specs: List[Any] = [
                ResBlockSpec(
                    in_ch=ch,
                    out_ch=int(mult * mc),
                    audio_dilation=d2(dilation),
                    video_attention=ds in cfg.video_attention_resolutions,
                    audio_attention=ds in cfg.audio_attention_resolutions,
                )
            ]
            dilation += 1
            ch = int(mult * mc)
            if ds in cfg.cross_attention_resolutions:
                i = cfg.cross_attention_resolutions.index(ds)
                specs.append(
                    CrossAttnSpec(
                        ch=ch,
                        heads=cfg.cross_heads(ch),
                        local_window=cfg.cross_attention_windows[i],
                        window_shift=cfg.cross_attention_shift,
                    )
                )
            encoder.append(tuple(specs))
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            encoder.append(
                (ResBlockSpec(in_ch=ch, out_ch=ch, audio_dilation=d2(dilation), down=True),)
            )
            dilation += 1
            input_block_chans.append(ch)
            ds *= 2

    # Middle: ResBlock / [full-window cross-attn] / ResBlock.  The reference
    # gates the middle cross-attention on windows == [1,4,8] (ref :875).
    middle: List[Any] = [
        ResBlockSpec(
            in_ch=ch, out_ch=ch, audio_dilation=d2(dilation),
            video_attention=True, audio_attention=True,
        )
    ]
    if tuple(cfg.cross_attention_windows) == (1, 4, 8):
        middle.append(
            CrossAttnSpec(
                ch=ch,
                heads=cfg.cross_heads(ch),
                local_window=cfg.video_size[0],
                window_shift=False,
            )
        )
    middle.append(
        ResBlockSpec(
            in_ch=ch, out_ch=ch, audio_dilation=d2(dilation),
            video_attention=True, audio_attention=True,
        )
    )

    decoder: List[Tuple[Any, ...]] = []
    skip_channels = tuple(input_block_chans)
    chans = list(input_block_chans)
    dilation -= 1
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for block_id in range(cfg.num_res_blocks + 1):
            ich = chans.pop()
            specs = [
                ResBlockSpec(
                    in_ch=ch + ich,
                    out_ch=int(mult * mc),
                    audio_dilation=d2(dilation),
                    video_attention=ds in cfg.video_attention_resolutions,
                    audio_attention=ds in cfg.audio_attention_resolutions,
                )
            ]
            dilation -= 1
            ch = int(mult * mc)
            if ds in cfg.cross_attention_resolutions:
                i = cfg.cross_attention_resolutions.index(ds)
                specs.append(
                    CrossAttnSpec(
                        ch=ch,
                        heads=cfg.cross_heads(ch),
                        local_window=cfg.cross_attention_windows[i],
                        window_shift=cfg.cross_attention_shift,
                    )
                )
            if level and block_id == cfg.num_res_blocks:
                # The reference only appends an up-ResBlock when
                # resblock_updown is set (ref :980-996) and otherwise emits no
                # upsample at all — which cannot produce valid skip shapes.
                # All shipped configs run resblock_updown=True
                # (ssh_scripts/multimodal_train.sh); for False we upsample via
                # a plain ResBlock-free resample marker to stay shape-correct.
                if cfg.resblock_updown:
                    specs.append(
                        ResBlockSpec(in_ch=ch, out_ch=ch, audio_dilation=d2(dilation), up=True)
                    )
                else:
                    specs.append("upsample")
                ds //= 2
            decoder.append(tuple(specs))

    return UNetPlan(
        encoder=tuple(encoder),
        middle=tuple(middle),
        decoder=tuple(decoder),
        skip_channels=skip_channels,
        out_ch=ch,
    )


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

class MMResBlock(nn.Module):
    """Dual-stream residual block with a shared timestep embedding
    (parity: ResBlock, multimodal_unet.py:291-495).

    Per modality: GN -> SiLU -> conv, then FiLM (scale-shift) or additive
    timestep conditioning, then GN -> SiLU -> dropout -> zero-init conv,
    plus a skip connection (identity or pointwise).  One embedding projection
    serves both streams (ref :366-372,:454-470).  Optional internal up/down
    resampling and per-modality self-attention.
    """

    spec: ResBlockSpec
    cfg: MMUNetConfig
    train: bool = False

    @nn.compact
    def __call__(self, video, audio, emb):
        # `train` is a static module attribute (not a call arg) so that
        # nn.remat sees only array arguments.  ``video``/``audio`` may be
        # tuples of channel parts (decoder skip concat, never materialized:
        # GroupNormFP32 normalizes parts as-if-concatenated, the concat then
        # fuses into the SiLU producers, and the skip path mixes parts with
        # kernel slices — see PointwiseFromParts).
        cfg, spec, train = self.cfg, self.spec, self.train
        dt = cfg.compute_dtype

        # channel-sum GN only under remat AND training: eval forwards fuse
        # better with the stock formulation (see layers.GroupNormFP32).
        gs = cfg.use_checkpoint and train
        # parts stay split through SiLU into the convs: each part's
        # normalize+SiLU chain input-fuses into its own kernel-slice conv
        # (SpatialConvFromParts), so the skip concat never materializes and
        # no standalone elementwise pass survives (profiled on the SR U-Net:
        # ~3 ms/256^2 decoder block; same structure here).
        video_h = GroupNormFP32(name="video_norm_in", channel_sum_stats=gs)(video)
        video_h = jax.tree.map(nn.silu, video_h)
        video_h = VideoConv(
            spec.out_ch, 3, conv_type=cfg.video_type, dtype=dt, name="video_conv_in"
        )(video_h)
        audio_h = GroupNormFP32(name="audio_norm_in", channel_sum_stats=gs)(audio)
        audio_h = jax.tree.map(nn.silu, audio_h)
        audio_h = AudioConv(
            spec.out_ch, 3, dilation=spec.audio_dilation, dtype=dt, name="audio_conv_in"
        )(audio_h)

        defer_up = False
        if spec.down:
            video_h, video = video_downsample(video_h), jax.tree.map(video_downsample, video)
            audio_h, audio = audio_downsample(audio_h), jax.tree.map(audio_downsample, audio)
        elif spec.up:
            if train and cfg.dropout > 0.0:
                video_h, video = video_upsample(video_h), jax.tree.map(video_upsample, video)
                audio_h, audio = audio_upsample(audio_h), jax.tree.map(audio_upsample, audio)
            else:
                # Nearest-upsample commutes EXACTLY with everything left in
                # this block — GN (uniform replication preserves mean/var),
                # the per-channel FiLM affine, SiLU, the 1x1 convs, and the
                # residual add (the reference runs in_layers BEFORE the
                # upsample, multimodal_unet.py:441-445, so no 3x3 conv
                # remains) — the whole tail runs at 4x fewer pixels and ONE
                # upsample happens at the end.  The only op pinned to
                # hi-res pixels is an active dropout mask, so the eager
                # order survives solely for train-with-dropout>0 configs.
                defer_up = True

        emb_dim = 2 * spec.out_ch if cfg.use_scale_shift_norm else spec.out_ch
        emb_out = nn.Dense(emb_dim, dtype=dt, param_dtype=jnp.float32, name="emb_proj")(
            nn.silu(emb)
        )

        dropout = nn.Dropout(cfg.dropout, deterministic=not train)
        if cfg.use_scale_shift_norm:
            # FiLM folds into the GN normalize coefficients ([B, C] math;
            # ONE fused pass over the activation — see GroupNormFP32.film)
            film = tuple(jnp.split(emb_out, 2, axis=-1))
            video_h = GroupNormFP32(name="video_norm_out", channel_sum_stats=gs)(
                video_h, film=film
            )
            video_h = dropout(nn.silu(video_h))
            audio_h = GroupNormFP32(name="audio_norm_out", channel_sum_stats=gs)(
                audio_h, film=film
            )
            audio_h = dropout(nn.silu(audio_h))
        else:
            video_h = video_h + emb_out[:, None, None, None, :]
            video_h = dropout(nn.silu(GroupNormFP32(name="video_norm_out", channel_sum_stats=gs)(video_h)))
            audio_h = audio_h + emb_out[:, None, :]
            audio_h = dropout(nn.silu(GroupNormFP32(name="audio_norm_out", channel_sum_stats=gs)(audio_h)))

        video_h = VideoConv(
            spec.out_ch, 1, conv_type="3d", zero_init=True, dtype=dt, name="video_conv_out"
        )(video_h)
        audio_h = AudioConv(
            spec.out_ch, 1, zero_init=True, dtype=dt, name="audio_conv_out"
        )(audio_h)

        if spec.out_ch == spec.in_ch:
            video_skip, audio_skip = cat_parts(video), cat_parts(audio)
        else:
            video_skip = VideoConv(
                spec.out_ch, 1, conv_type="3d", dtype=dt, name="video_skip"
            )(video)
            audio_skip = AudioConv(spec.out_ch, 1, dtype=dt, name="audio_skip")(audio)

        video_out = video_skip + video_h
        audio_out = audio_skip + audio_h
        if defer_up:
            video_out = video_upsample(video_out)
            audio_out = audio_upsample(audio_out)

        if spec.video_attention:
            video_out = FactorizedVideoAttention(
                spec.out_ch, cfg.num_heads, dtype=dt, name="video_attn",
                gn_sums=gs,
            )(video_out)
        if spec.audio_attention:
            audio_out = TokenSelfAttention(
                spec.out_ch, cfg.num_heads, dtype=dt, name="audio_attn",
                gn_sums=gs,
            )(audio_out)
        return video_out, audio_out


class InitialBlock(nn.Module):
    """First conv of each stream (parity: InitialBlock, ref :680-694)."""

    out_ch: int
    cfg: MMUNetConfig

    @nn.compact
    def __call__(self, video, audio):
        dt = self.cfg.compute_dtype
        v = VideoConv(self.out_ch, 3, conv_type="2d+1d", dtype=dt, name="video_conv")(video)
        a = AudioConv(self.out_ch, 3, dtype=dt, name="audio_conv")(audio)
        return v, a


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class MultimodalUNet(nn.Module):
    """The coupled MM-UNet (parity: multimodal_unet.py:697-1101).

    Forward signature (channels-last):
      ``(video [B,F,H,W,C], audio [B,L,C], timesteps [B], label=None)``
      -> ``(video_eps [B,F,H,W,Cout], audio_eps [B,L,Cout])``.

    RNG collections: ``'shift'`` (RS-MMA random window shift — used at train
    *and* sampling time when cross_attention_shift is on), ``'dropout'``.
    """

    cfg: MMUNetConfig

    @nn.compact
    def __call__(self, video, audio, timesteps, label=None, *, train: bool = False):
        cfg = self.cfg
        plan = build_plan(cfg)
        dt = cfg.compute_dtype

        emb = TimeEmbedding(
            cfg.model_channels, cfg.model_channels, dtype=dt, name="time_embed"
        )(timesteps)
        if cfg.num_classes is not None:
            assert label is not None
            emb = emb + nn.Embed(
                cfg.num_classes, cfg.model_channels, dtype=dt, param_dtype=jnp.float32,
                name="label_emb",
            )(label)

        video = video.astype(dt)
        audio = audio.astype(dt)

        # Per-block remat, but keep the attention kernel outputs (tagged
        # 'attn_out' in TokenSelfAttention) — recomputing the Pallas
        # attention in the backward pass costs more step time than the
        # saved activations cost HBM (the conv activations, the bulk of
        # the memory, are still rematerialized).  Saving the packed qkv
        # ('attn_qkv') as well lets partial-eval drop the forward kernel
        # replay that otherwise runs just to rebuild the custom_vjp
        # residual (profiled ~17 ms/step b4); MMDIFF_SAVE_QKV=0 opts out
        # if a config is HBM-bound.
        _save = ("attn_out",) if os.environ.get(
            "MMDIFF_SAVE_QKV", "1"
        ) == "0" else ("attn_out", "attn_qkv")
        remat_policy = jax.checkpoint_policies.save_only_these_names(*_save)
        # Selective remat: low-resolution blocks hold tiny activations but
        # still pay a full forward recompute in the backward.  Skip remat
        # when the video token count (F*H*W) at the block's input is below
        # the threshold — the HBM cost of saving those activations is a few
        # hundred MB while the recompute saving is a full low-res forward.
        remat_min_tokens = int(os.environ.get("MMDIFF_REMAT_MIN_TOKENS", "4096"))

        def maybe_remat(m, video_shape):
            if not cfg.use_checkpoint:
                return m
            tokens = video_shape[1] * video_shape[2] * video_shape[3]
            if tokens < remat_min_tokens:
                return m
            return nn.remat(m, static_argnums=(), policy=remat_policy)

        def run_specs(specs, video, audio, stage, idx):
            for j, spec in enumerate(specs):
                name = f"{stage}_{idx}_{j}"
                if spec == "initial":
                    video, audio = InitialBlock(
                        int(cfg.channel_mult[0] * cfg.model_channels), cfg, name=name + "_init"
                    )(video, audio)
                elif spec == "upsample":
                    video, audio = video_upsample(video), audio_upsample(audio)
                elif isinstance(spec, ResBlockSpec):
                    vshape = video[0].shape if isinstance(video, tuple) else video.shape
                    block = maybe_remat(MMResBlock, vshape)(
                        spec, cfg, train, name=name + "_res"
                    )
                    video, audio = block(video, audio, emb)
                elif isinstance(spec, CrossAttnSpec):
                    video, audio = RSMMACrossAttention(
                        channels=spec.ch,
                        num_heads=spec.heads,
                        local_window=spec.local_window,
                        window_shift=spec.window_shift,
                        dtype=dt,
                        gn_sums=cfg.use_checkpoint and train,
                        name=name + "_xattn",
                    )(video, audio)
                else:
                    raise ValueError(spec)
            return video, audio

        video_hs, audio_hs = [], []
        for i, specs in enumerate(plan.encoder):
            video, audio = run_specs(specs, video, audio, "enc", i)
            video_hs.append(video)
            audio_hs.append(audio)

        video, audio = run_specs(plan.middle, video, audio, "mid", 0)

        for i, specs in enumerate(plan.decoder):
            # virtual concat: the leading ResBlock of every decoder entry
            # consumes the (stream, skip) parts without materializing the
            # channel concatenation (see MMResBlock docstring).
            video = (video, video_hs.pop())
            audio = (audio, audio_hs.pop())
            video, audio = run_specs(specs, video, audio, "dec", i)

        video = nn.silu(GroupNormFP32(name="video_out_norm", channel_sum_stats=cfg.use_checkpoint and train)(video))
        video = VideoConv(
            cfg.video_out_channels, 3, conv_type="3d", zero_init=True, dtype=dt,
            name="video_out_conv",
        )(video)
        audio = nn.silu(GroupNormFP32(name="audio_out_norm", channel_sum_stats=cfg.use_checkpoint and train)(audio))
        audio = AudioConv(
            cfg.audio_out_channels, 3, zero_init=True, dtype=dt, name="audio_out_conv"
        )(audio)
        return video.astype(jnp.float32), audio.astype(jnp.float32)
