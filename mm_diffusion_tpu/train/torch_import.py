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
    """1x1-conv projection weight [C_out, C_in, 1] -> Dense kernel
    [C_in, C_out] (the flax attention modules consume the block-attention
    kernel's merged-head [N, T, C] output with a plain Dense; heads is
    unused but kept for call-site symmetry)."""
    del heads
    return _dense_from_conv1x1(w)


def _token_attention(sd: _SD, prefix: str, heads: int) -> Dict[str, Any]:
    """SingleModalAtten -> TokenSelfAttention (qkv 1x1 conv -> Dense; proj
    1x1 conv -> Dense).

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


# ---------------------------------------------------------------------------
# Guided-diffusion image UNet / SuperRes import
# (reference: image_unet.py:395-715 module tree; the published
#  64_256_upsampler.pt uses the same guided-diffusion naming —
#  train_util.py:26 PRE_TRAIN_MODELS, :191-216 _transfer_state_dict)
# ---------------------------------------------------------------------------


def _conv2d(w):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.transpose(w, (2, 3, 1, 0))


def _img_groupnorm(sd: _SD, prefix: str) -> Dict[str, Any]:
    """ImgGroupNorm is a bare nn.GroupNorm (nn.py:35, Imgnormalization) —
    keys are `<prefix>.weight/.bias` (no .GroupNorm child like the MM model)."""
    return {
        "GroupNorm_0": {
            "scale": sd(f"{prefix}.weight"),
            "bias": sd(f"{prefix}.bias"),
        }
    }


def _legacy_qkv_to_thirds(w, heads):
    """QKVAttentionLegacy channel order [h0(q k v), h1(q k v), ...] ->
    thirds-major [q(all heads), k(all heads), v(all heads)]
    (image AttentionBlock defaults to the legacy order,
    image_unet.py:288-292 use_new_attention_order=False)."""
    out_ch, in_ch = w.shape[0], w.shape[1]
    d = out_ch // (3 * heads)
    w = w.reshape(heads, 3, d, in_ch)
    w = np.transpose(w, (1, 0, 2, 3)).reshape(out_ch, in_ch)
    return w


def _image_attention(sd: _SD, prefix: str, heads: int) -> Dict[str, Any]:
    qkv_w = sd(f"{prefix}.qkv.weight")  # [3HD, C, 1]
    qkv_b = sd(f"{prefix}.qkv.bias")
    qkv_w = _legacy_qkv_to_thirds(qkv_w.reshape(qkv_w.shape[0], qkv_w.shape[1]), heads)
    d = qkv_b.shape[0] // (3 * heads)
    qkv_b = qkv_b.reshape(heads, 3, d).transpose(1, 0, 2).reshape(-1)
    # ImageAttention wraps TokenSelfAttention as an (auto-named) child module
    return {
        "TokenSelfAttention_0": {
            "norm": _img_groupnorm(sd, f"{prefix}.norm"),
            "qkv": {"kernel": np.transpose(qkv_w, (1, 0)), "bias": qkv_b},
            "proj_out": {
                "kernel": _headed_proj(sd(f"{prefix}.proj_out.weight"), heads),
                "bias": sd(f"{prefix}.proj_out.bias"),
            },
        }
    }


def _image_resblock(sd: _SD, prefix: str, in_ch: int, out_ch: int) -> Dict[str, Any]:
    out: Dict[str, Any] = {
        "norm_in": _img_groupnorm(sd, f"{prefix}.in_layers.0"),
        "conv_in": {
            "kernel": _conv2d(sd(f"{prefix}.in_layers.2.weight")),
            "bias": sd(f"{prefix}.in_layers.2.bias"),
        },
        "emb_proj": {
            "kernel": _dense(sd(f"{prefix}.emb_layers.1.weight")),
            "bias": sd(f"{prefix}.emb_layers.1.bias"),
        },
        "norm_out": _img_groupnorm(sd, f"{prefix}.out_layers.0"),
        "conv_out": {
            "kernel": _conv2d(sd(f"{prefix}.out_layers.3.weight")),
            "bias": sd(f"{prefix}.out_layers.3.bias"),
        },
    }
    if out_ch != in_ch:
        out["skip"] = {
            "kernel": _conv2d(sd(f"{prefix}.skip_connection.weight")),
            "bias": sd(f"{prefix}.skip_connection.bias"),
        }
    return out


def convert_image_unet_state_dict(state_dict: Dict[str, Any], cfg):
    """Guided-diffusion / reference image UNet state dict -> flax params for
    :class:`mm_diffusion_tpu.models.image_unet.ImageUNet`.

    Works for both plain ImageUnet checkpoints and ImageSuperResModel ones
    (the SR model IS the UNet with doubled in_channels, image_unet.py:700-710).
    Returns ``(params, unused_keys)``.
    """
    from ..models.image_unet import _RB, build_image_plan

    sd = _SD(state_dict)
    encoder, middle, decoder, _ = build_image_plan(cfg)
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
    if cfg.num_classes is not None and "label_emb.weight" in sd.sd:
        params["label_emb"] = {"embedding": sd("label_emb.weight")}

    for i, specs in enumerate(encoder):
        for j, spec in enumerate(specs):
            name = f"enc_{i}_{j}"
            if spec == "initial":
                params[name + "_conv"] = {
                    "kernel": _conv2d(sd("input_blocks.0.0.weight")),
                    "bias": sd("input_blocks.0.0.bias"),
                }
            elif spec == "downsample":
                params[name + "_down"] = {
                    "kernel": _conv2d(sd(f"input_blocks.{i}.0.op.weight")),
                    "bias": sd(f"input_blocks.{i}.0.op.bias"),
                }
            elif isinstance(spec, _RB):
                params[name + "_res"] = _image_resblock(
                    sd, f"input_blocks.{i}.0", spec.in_ch, spec.out_ch
                )
                if spec.attn_heads:
                    params[name + "_attn"] = _image_attention(
                        sd, f"input_blocks.{i}.1", spec.attn_heads
                    )

    params["mid_0_0_res"] = _image_resblock(
        sd, "middle_block.0", middle[0].in_ch, middle[0].out_ch
    )
    params["mid_0_0_attn"] = _image_attention(sd, "middle_block.1", middle[0].attn_heads)
    params["mid_0_1_res"] = _image_resblock(
        sd, "middle_block.2", middle[1].in_ch, middle[1].out_ch
    )

    for i, specs in enumerate(decoder):
        tsub = 0
        for j, spec in enumerate(specs):
            name = f"dec_{i}_{j}"
            if spec == "upsample":
                params[name + "_up"] = {
                    "kernel": _conv2d(sd(f"output_blocks.{i}.{tsub}.conv.weight")),
                    "bias": sd(f"output_blocks.{i}.{tsub}.conv.bias"),
                }
                tsub += 1
            elif isinstance(spec, _RB):
                params[name + "_res"] = _image_resblock(
                    sd, f"output_blocks.{i}.{tsub}", spec.in_ch, spec.out_ch
                )
                tsub += 1
                if spec.attn_heads:
                    params[name + "_attn"] = _image_attention(
                        sd, f"output_blocks.{i}.{tsub}", spec.attn_heads
                    )
                    tsub += 1

    params["out_norm"] = _img_groupnorm(sd, "out.0")
    params["out_conv"] = {
        "kernel": _conv2d(sd("out.2.weight")),
        "bias": sd("out.2.bias"),
    }
    return params, sd.unused()


def load_torch_image_checkpoint(path: str, cfg, super_res: bool = False):
    """Load a guided-diffusion / reference image ``.pt`` checkpoint.

    With ``super_res=True`` the params are nested under ``unet`` to match
    :class:`ImageSuperResModel`'s module tree.
    """
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, unused = convert_image_unet_state_dict(sd, cfg)
    if unused:
        from ..utils import logger

        logger.log(
            f"torch image import: {len(unused)} unused keys (first: {unused[:5]})"
        )
    return {"unet": params} if super_res else params
