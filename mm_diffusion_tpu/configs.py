"""Config schema + factories mirroring the reference CLI surface.

Re-design of `mm_diffusion/multimodal_script_util.py` and
`mm_diffusion/script_util.py`: the same flag names, comma-string encodings and
defaults (so reference launch commands translate 1:1), feeding typed configs
instead of loose dicts.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

from .diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    make_schedule,
)
from .models.mm_unet import MMUNetConfig


def diffusion_defaults() -> Dict[str, Any]:
    """(parity: multimodal_script_util.py:12-25)"""
    return dict(
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
    )


def model_defaults() -> Dict[str, Any]:
    """(parity: multimodal_script_util.py:28-55)"""
    return dict(
        video_size="16,3,64,64",
        audio_size="1,25600",
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        num_head_channels=-1,
        cross_attention_resolutions="2,4,8",
        cross_attention_windows="1,4,8",
        cross_attention_shift=True,
        video_attention_resolutions="2,4,8",
        audio_attention_resolutions="-1",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        resblock_updown=False,
        use_fp16=False,
        video_type="2d+1d",
        audio_type="1d",
    )


def model_and_diffusion_defaults() -> Dict[str, Any]:
    res = model_defaults()
    res.update(diffusion_defaults())
    return res


def _ints(s) -> Tuple[int, ...]:
    if isinstance(s, (tuple, list)):
        return tuple(int(v) for v in s)
    return tuple(int(v) for v in str(s).split(","))


def default_channel_mult(image_size: int) -> Tuple[int, ...]:
    """(parity: multimodal_script_util.py:157-169 / script_util.py image sizes)"""
    table = {
        512: (0.5, 1, 1, 2, 2, 4, 4),
        256: (1, 1, 2, 2, 4, 4),
        128: (1, 1, 2, 3, 4),
        64: (1, 2, 3, 4),
        32: (1, 2, 2, 2),
    }
    if image_size not in table:
        raise ValueError(f"unsupported image size: {image_size}")
    return table[image_size]


def create_model_config(
    video_size="16,3,64,64",
    audio_size="1,25600",
    num_channels=128,
    num_res_blocks=2,
    channel_mult="",
    learn_sigma=False,
    class_cond=False,
    use_checkpoint=False,
    cross_attention_resolutions="2,4,8",
    cross_attention_windows="1,4,8",
    cross_attention_shift=True,
    video_attention_resolutions="2,4,8",
    audio_attention_resolutions="-1",
    num_heads=4,
    num_head_channels=-1,
    num_heads_upsample=-1,
    use_scale_shift_norm=True,
    dropout=0.0,
    use_fp16=False,
    video_type="2d+1d",
    audio_type="1d",
    resblock_updown=True,
    dtype: Optional[str] = None,
    **_unused,
) -> MMUNetConfig:
    """Build an :class:`MMUNetConfig` from reference-style flags
    (parity: create_model, multimodal_script_util.py:131-201)."""
    video_size = _ints(video_size)
    audio_size = _ints(audio_size)
    if class_cond:
        # The reference accepts --class_cond and then hard-wires
        # num_classes=None for the MM model (multimodal_script_util.py:193).
        # Refuse loudly instead of training an unconditional model silently;
        # class conditioning IS supported for the SR model (--sr_class_cond).
        raise NotImplementedError(
            "class_cond=True is accepted but unwired in the reference MM model "
            "(multimodal_script_util.py:193 sets num_classes=None); this port "
            "matches that and refuses rather than silently ignoring the flag."
        )
    if channel_mult in ("", None):
        channel_mult = default_channel_mult(video_size[-1])
    else:
        channel_mult = _ints(channel_mult)
    if dtype is None:
        # use_fp16 in the reference maps to "mixed precision torso"; the TPU
        # equivalent is bf16 compute.  fp32 otherwise.
        dtype = "bfloat16" if use_fp16 else "float32"
    return MMUNetConfig(
        video_size=tuple(video_size),
        audio_size=tuple(audio_size),
        model_channels=num_channels,
        video_out_channels=(6 if learn_sigma else 3),
        audio_out_channels=(2 if learn_sigma else 1),
        num_res_blocks=num_res_blocks,
        cross_attention_resolutions=_ints(cross_attention_resolutions),
        cross_attention_windows=_ints(cross_attention_windows),
        cross_attention_shift=bool(cross_attention_shift),
        video_attention_resolutions=_ints(video_attention_resolutions),
        audio_attention_resolutions=_ints(audio_attention_resolutions),
        channel_mult=tuple(channel_mult),
        dropout=dropout,
        num_heads=num_heads,
        num_head_channels=num_head_channels,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=bool(use_scale_shift_norm),
        resblock_updown=bool(resblock_updown),
        video_type=video_type,
        audio_type=audio_type,
        num_classes=None,
        use_checkpoint=bool(use_checkpoint),
        dtype=dtype,
    )


def create_gaussian_diffusion(
    *,
    steps=1000,
    learn_sigma=False,
    sigma_small=False,
    noise_schedule="linear",
    use_kl=False,
    predict_xstart=False,
    rescale_timesteps=False,
    rescale_learned_sigmas=False,
    timestep_respacing="",
) -> GaussianDiffusion:
    """(parity: create_gaussian_diffusion, multimodal_script_util.py:204-242)"""
    if use_kl:
        loss_type = LossType.RESCALED_KL
    elif rescale_learned_sigmas:
        loss_type = LossType.RESCALED_MSE
    else:
        loss_type = LossType.MSE
    if not timestep_respacing:
        timestep_respacing = None
    tables = make_schedule(noise_schedule, steps, timestep_respacing)
    return GaussianDiffusion(
        tables=tables,
        mean_type=ModelMeanType.EPSILON if not predict_xstart else ModelMeanType.START_X,
        var_type=(
            (ModelVarType.FIXED_LARGE if not sigma_small else ModelVarType.FIXED_SMALL)
            if not learn_sigma
            else ModelVarType.LEARNED_RANGE
        ),
        loss_type=loss_type,
        rescale_timesteps=rescale_timesteps,
    )


def create_model_and_diffusion(**kwargs):
    """(parity: create_model_and_diffusion, multimodal_script_util.py:62-128)"""
    from .models.mm_unet import MultimodalUNet

    cfg = create_model_config(**kwargs)
    dd = diffusion_defaults()
    diffusion = create_gaussian_diffusion(
        steps=kwargs.get("diffusion_steps", dd["diffusion_steps"]),
        learn_sigma=kwargs.get("learn_sigma", dd["learn_sigma"]),
        noise_schedule=kwargs.get("noise_schedule", dd["noise_schedule"]),
        use_kl=kwargs.get("use_kl", dd["use_kl"]),
        predict_xstart=kwargs.get("predict_xstart", dd["predict_xstart"]),
        rescale_timesteps=kwargs.get("rescale_timesteps", dd["rescale_timesteps"]),
        rescale_learned_sigmas=kwargs.get(
            "rescale_learned_sigmas", dd["rescale_learned_sigmas"]
        ),
        timestep_respacing=kwargs.get("timestep_respacing", ""),
    )
    return MultimodalUNet(cfg), diffusion


# -- image / SR model factories (parity: script_util.py) -----------------------

def image_sr_model_and_diffusion_defaults() -> Dict[str, Any]:
    """(parity: image_sr_model_and_diffusion_defaults, script_util.py:70-106)"""
    res = dict(
        sr_num_channels=128,
        sr_num_res_blocks=2,
        sr_num_heads=4,
        sr_num_heads_upsample=-1,
        sr_num_head_channels=-1,
        sr_attention_resolutions="16,8",
        sr_dropout=0.0,
        sr_class_cond=False,
        use_checkpoint=False,
        sr_use_scale_shift_norm=True,
        sr_resblock_updown=False,
        use_fp16=False,
        sr_learn_sigma=True,
        large_size=256,
        small_size=128,
        sr_diffusion_steps=1000,
        sr_timestep_respacing="",
        noise_schedule="linear",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
    )
    return res


def sr_channel_mult(large_size: int) -> Tuple[int, ...]:
    """(parity: image_sr_create_model, script_util.py:399-406)"""
    if large_size in (512, 256):
        return (1, 1, 2, 2, 4, 4)
    if large_size == 64:
        return (1, 2, 3, 4)
    raise ValueError(f"unsupported large size: {large_size}")


def create_image_sr_config(
    large_size=256,
    small_size=128,
    sr_num_channels=128,
    sr_num_res_blocks=2,
    sr_learn_sigma=True,
    sr_class_cond=False,
    use_checkpoint=False,
    sr_attention_resolutions="16,8",
    sr_num_heads=4,
    sr_num_head_channels=-1,
    sr_num_heads_upsample=-1,
    sr_use_scale_shift_norm=True,
    sr_dropout=0.0,
    sr_resblock_updown=False,
    use_fp16=False,
    dtype: Optional[str] = None,
    **_unused,
):
    """Build an :class:`ImageUNetConfig` for the SR model
    (parity: image_sr_create_model, script_util.py:381-430).  ``in_channels``
    is doubled for the low_res concat (image_unet.py:700-709)."""
    from .models.image_unet import ImageUNetConfig

    attention_ds = tuple(
        int(r) for r in str(sr_attention_resolutions).split(",") if r != ""
    )
    if dtype is None:
        dtype = "bfloat16" if use_fp16 else "float32"
    return ImageUNetConfig(
        image_size=large_size,
        in_channels=6,  # 3 + 3 low_res concat
        model_channels=sr_num_channels,
        out_channels=(6 if sr_learn_sigma else 3),
        num_res_blocks=sr_num_res_blocks,
        attention_resolutions=attention_ds,
        dropout=sr_dropout,
        channel_mult=sr_channel_mult(large_size),
        num_classes=(1000 if sr_class_cond else None),
        num_heads=sr_num_heads,
        num_head_channels=sr_num_head_channels,
        num_heads_upsample=sr_num_heads_upsample,
        use_scale_shift_norm=bool(sr_use_scale_shift_norm),
        resblock_updown=bool(sr_resblock_updown),
        use_checkpoint=bool(use_checkpoint),
        dtype=dtype,
    )


def image_sr_create_model_and_diffusion(**kwargs):
    """(parity: image_sr_create_model_and_diffusion, script_util.py:326-379)"""
    from .models.image_unet import ImageSuperResModel

    defaults = image_sr_model_and_diffusion_defaults()
    merged = {**defaults, **kwargs}
    cfg = create_image_sr_config(**merged)
    diffusion = create_gaussian_diffusion(
        steps=merged["sr_diffusion_steps"],
        learn_sigma=merged["sr_learn_sigma"],
        noise_schedule=merged["noise_schedule"],
        use_kl=merged["use_kl"],
        predict_xstart=merged["predict_xstart"],
        rescale_timesteps=merged["rescale_timesteps"],
        rescale_learned_sigmas=merged["rescale_learned_sigmas"],
        timestep_respacing=merged["sr_timestep_respacing"],
    )
    return ImageSuperResModel(cfg), diffusion


# -- argparse helpers (parity: multimodal_script_util.py:245-270) -------------

def str2bool(v) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("boolean value expected")


def add_dict_to_argparser(parser: argparse.ArgumentParser, default_dict: Dict[str, Any]):
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    return {k: getattr(args, k) for k in keys}
