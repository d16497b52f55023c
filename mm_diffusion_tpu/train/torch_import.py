"""PyTorch checkpoint import: reference MM-Diffusion ``.pt`` -> flax params.

The reference publishes Landscape/AIST++ checkpoints in PyTorch naming
(`multimodal_train_util.py:470-493` save protocol; module tree defined in
`mm_diffusion/multimodal_unet.py`).  This shim converts such state dicts into
this framework's parameter pytree so published weights run unchanged and
FVD/KVD/FAD parity can be validated (SURVEY §5 checkpoint/resume plan).

Layout conversions (torch -> flax, channels-last):
  * ConvNd weight [O, I, k...] -> [k..., I, O]
  * our factorized VideoConv uses 3-D kernels (1,k,k)/(k,1,1): torch 2-D and
    1-D kernels get the missing singleton axes
  * 1x1 convs used as token projections become Dense kernels [I, O]
  * Linear weight [O, I] -> kernel [I, O]
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..models.mm_unet import CrossAttnSpec, MMUNetConfig, ResBlockSpec, build_plan


def _conv2d_to_spatial(w):  # [O,I,kh,kw] -> [1,kh,kw,I,O]
    return np.transpose(w, (2, 3, 1, 0))[None]


def _conv1d_to_temporal(w):  # [O,I,kt] -> [kt,1,1,I,O]
    return np.transpose(w, (2, 1, 0))[:, None, None]


def _conv3d(w):  # [O,I,kt,kh,kw] -> [kt,kh,kw,I,O]
    return np.transpose(w, (2, 3, 4, 1, 0))


def _conv1d(w):  # [O,I,k] -> [k,I,O]
    return np.transpose(w, (2, 1, 0))


def _dense_from_conv1x1(w):  # [O,I,1] or [O,I,1,1,1] -> [I,O]
    return np.transpose(w.reshape(w.shape[0], w.shape[1]), (1, 0))


def _dense(w):  # [O,I] -> [I,O]
    return np.transpose(w, (1, 0))


class _SD:
    """State-dict view with consumption tracking."""

    def __init__(self, sd: Dict[str, Any]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used = set()

    def __call__(self, key):
        self.used.add(key)
        return self.sd[key]

    def unused(self):
        return sorted(set(self.sd) - self.used)


def _video_conv(sd: _SD, prefix: str, conv_type: str) -> Dict[str, Any]:
    if conv_type == "2d+1d":
        return {
            "spatial": {
                "kernel": _conv2d_to_spatial(sd(f"{prefix}.video_conv_spatial.weight")),
                "bias": sd(f"{prefix}.video_conv_spatial.bias"),
            },
            "temporal": {
                "kernel": _conv1d_to_temporal(sd(f"{prefix}.video_conv_temporal.weight")),
                "bias": sd(f"{prefix}.video_conv_temporal.bias"),
            },
        }
    return {
        "conv": {
            "kernel": _conv3d(sd(f"{prefix}.video_conv.weight")),
            "bias": sd(f"{prefix}.video_conv.bias"),
        }
    }


def _audio_conv(sd: _SD, prefix: str) -> Dict[str, Any]:
    return {
        "conv": {
            "kernel": _conv1d(sd(f"{prefix}.audio_conv.weight")),
            "bias": sd(f"{prefix}.audio_conv.bias"),
        }
    }


def _groupnorm(sd: _SD, prefix: str) -> Dict[str, Any]:
    return {
        "GroupNorm_0": {
            "scale": sd(f"{prefix}.weight"),
            "bias": sd(f"{prefix}.bias"),
        }
    }


def _headed_proj(w, heads):
    """1x1-conv projection weight [C_out, C_in, 1] -> DenseGeneral kernel
    [H, D, C_out] (the flax side contracts heads-major attention outputs)."""
    dense = _dense_from_conv1x1(w)  # [C_in, C_out]
    c_in, c_out = dense.shape
    return dense.reshape(heads, c_in // heads, c_out)


def _token_attention(sd: _SD, prefix: str, heads: int) -> Dict[str, Any]:
    """SingleModalAtten -> TokenSelfAttention (qkv 1x1 conv -> Dense; proj
    1x1 conv -> heads-major DenseGeneral).

    Channel layouts agree: both split qkv into thirds then heads
    (SingleModalQKVAttention views (bs*heads, ch, T) from the concatenated
    [q|k|v] channel dim, multimodal_unet.py:231-239)."""
    return {
        "norm": _groupnorm(sd, f"{prefix}.norm.GroupNorm"),
        "qkv": {
            "kernel": _dense_from_conv1x1(sd(f"{prefix}.qkv.weight")),
            "bias": sd(f"{prefix}.qkv.bias"),
        },
        "proj_out": {
            "kernel": _headed_proj(sd(f"{prefix}.proj_out.weight"), heads),
            "bias": sd(f"{prefix}.proj_out.bias"),
        },
    }


def _resblock(sd: _SD, prefix: str, spec: ResBlockSpec, cfg: MMUNetConfig) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "video_norm_in": _groupnorm(sd, f"{prefix}.video_in_layers.0.GroupNorm"),
        "video_conv_in": _video_conv(sd, f"{prefix}.video_in_layers.2", cfg.video_type),
        "audio_norm_in": _groupnorm(sd, f"{prefix}.audio_in_layers.0.GroupNorm"),
        "audio_conv_in": _audio_conv(sd, f"{prefix}.audio_in_layers.2"),
        "emb_proj": {
            "kernel": _dense(sd(f"{prefix}.emb_layers.1.weight")),
            "bias": sd(f"{prefix}.emb_layers.1.bias"),
        },
        "video_norm_out": _groupnorm(sd, f"{prefix}.video_out_layers.0.GroupNorm"),
        "video_conv_out": _video_conv(sd, f"{prefix}.video_out_layers.3", "3d"),
        "audio_norm_out": _groupnorm(sd, f"{prefix}.audio_out_layers.0.GroupNorm"),
        "audio_conv_out": _audio_conv(sd, f"{prefix}.audio_out_layers.3"),
    }
    if spec.out_ch != spec.in_ch:
        out["video_skip"] = _video_conv(sd, f"{prefix}.video_skip_connection", "3d")
        out["audio_skip"] = _audio_conv(sd, f"{prefix}.audio_skip_connection")
    if spec.video_attention:
        out["video_attn"] = {
            "spatial": _token_attention(sd, f"{prefix}.spatial_attention_block", cfg.num_heads),
            "temporal": _token_attention(sd, f"{prefix}.temporal_attention_block", cfg.num_heads),
        }
    if spec.audio_attention:
        out["audio_attn"] = _token_attention(sd, f"{prefix}.audio_attention_block", cfg.num_heads)
    return out


def _cross_attention(sd: _SD, prefix: str, heads: int) -> Dict[str, Any]:
    return {
        "v_norm": _groupnorm(sd, f"{prefix}.v_norm.GroupNorm"),
        "a_norm": _groupnorm(sd, f"{prefix}.a_norm.GroupNorm"),
        "v_qkv": {
            "kernel": _dense_from_conv1x1(sd(f"{prefix}.v_qkv.weight")),
            "bias": sd(f"{prefix}.v_qkv.bias"),
        },
        "a_qkv": {
            "kernel": _dense_from_conv1x1(sd(f"{prefix}.a_qkv.weight")),
            "bias": sd(f"{prefix}.a_qkv.bias"),
        },
        "video_proj_out": {
            "kernel": _headed_proj(sd(f"{prefix}.video_proj_out.video_conv.weight"), heads),
            "bias": sd(f"{prefix}.video_proj_out.video_conv.bias"),
        },
        "audio_proj_out": {
            "kernel": _headed_proj(sd(f"{prefix}.audio_proj_out.audio_conv.weight"), heads),
            "bias": sd(f"{prefix}.audio_proj_out.audio_conv.bias"),
        },
    }


def convert_mm_unet_state_dict(state_dict: Dict[str, Any], cfg: MMUNetConfig):
    """Reference MultimodalUNet state dict -> flax params pytree.

    Returns ``(params, unused_keys)``; unused keys indicate a config mismatch.
    """
    sd = _SD(state_dict)
    plan = build_plan(cfg)
    params: Dict[str, Any] = {}

    params["time_embed"] = {
        "Dense_0": {
            "kernel": _dense(sd("time_embed.0.weight")),
            "bias": sd("time_embed.0.bias"),
        },
        "Dense_1": {
            "kernel": _dense(sd("time_embed.2.weight")),
            "bias": sd("time_embed.2.bias"),
        },
    }

    def convert_stage(stage_name, blocks, torch_name):
        for i, specs in enumerate(blocks):
            for j, spec in enumerate(specs):
                tprefix = f"{torch_name}.{i}.{j}" if torch_name != "middle_blocks" else f"middle_blocks.{j}"
                if spec == "initial":
                    params[f"{stage_name}_{i}_{j}_init"] = {
                        "video_conv": _video_conv(sd, f"{tprefix}.video_conv", "2d+1d"),
                        "audio_conv": _audio_conv(sd, f"{tprefix}.audio_conv"),
                    }
                elif spec == "upsample":
                    continue
                elif isinstance(spec, ResBlockSpec):
                    params[f"{stage_name}_{i}_{j}_res"] = _resblock(sd, tprefix, spec, cfg)
                elif isinstance(spec, CrossAttnSpec):
                    params[f"{stage_name}_{i}_{j}_xattn"] = _cross_attention(
                        sd, tprefix, spec.heads
                    )

    convert_stage("enc", plan.encoder, "input_blocks")
    convert_stage("mid", [plan.middle], "middle_blocks")
    convert_stage("dec", plan.decoder, "output_blocks")

    params["video_out_norm"] = _groupnorm(sd, "video_out.0.GroupNorm")
    params["video_out_conv"] = _video_conv(sd, "video_out.2", "3d")
    params["audio_out_norm"] = _groupnorm(sd, "audio_out.0.GroupNorm")
    params["audio_out_conv"] = _audio_conv(sd, "audio_out.2")
    return params, sd.unused()


def load_torch_checkpoint(path: str, cfg: MMUNetConfig):
    """Load a reference ``model*.pt`` / ``ema_*.pt`` file and convert."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    params, unused = convert_mm_unet_state_dict(sd, cfg)
    if unused:
        from ..utils import logger

        logger.log(f"torch import: {len(unused)} unused keys (first: {unused[:5]})")
    return params
