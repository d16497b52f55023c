"""Zero-shot audio->video generation (+ optional SR chain).

CLI-parity re-design of `py_scripts/audio2video_sample_sr.py:44-246`:
ground-truth (video,audio) pairs come from the dataset; the audio is fixed as
the condition and video is generated with the replacement method
(classifier_scale=0) or the gradient method (classifier_scale>0), then frames
are super-resolved.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import configs
from ..configs import add_dict_to_argparser, args_to_dict
from ..data import media
from ..data.video import load_data
from ..models.mm_unet import MultimodalUNet
from ..sampling import build_conditional_sampler, build_sr_sampler, shared_clip_noise
from ..utils import logger
from .multimodal_sample_sr import load_model_params


def create_argparser():
    defaults = dict(
        data_dir="synthetic",
        multimodal_model_path="random",
        sr_model_path="",
        output_dir="./a2v_samples",
        batch_size=1,
        sample_num=4,
        classifier_scale=0.0,  # 0 = replacement; >0 = gradient method
        seed=42,
        video_fps=10,
        audio_fps=16000,
        sr_sample_fn="ddim",
        sr_sample_steps=25,
    )
    defaults.update(configs.model_and_diffusion_defaults())
    defaults.update(configs.image_sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def run_conditional(args, condition_key: str, save_prefix: str):
    logger.configure(args.output_dir)
    log = logger.get_current()

    model_kwargs = args_to_dict(args, configs.model_and_diffusion_defaults().keys())
    cfg = configs.create_model_config(**model_kwargs)
    model = MultimodalUNet(cfg)
    diffusion = configs.create_gaussian_diffusion(
        steps=args.diffusion_steps,
        learn_sigma=args.learn_sigma,
        noise_schedule=args.noise_schedule,
        timestep_respacing=args.timestep_respacing,
    )
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    rng = jax.random.PRNGKey(args.seed)
    rng, k1 = jax.random.split(rng)
    params = load_model_params(
        args.multimodal_model_path,
        model,
        {"params": k1, "shift": k1},
        (jnp.zeros((1, f, h, w, c)), jnp.zeros((1, l, ca)), jnp.zeros((1,), jnp.int32)),
    )
    sampler = jax.jit(
        build_conditional_sampler(
            model, diffusion, params,
            condition_key=condition_key, class_scale=args.classifier_scale,
        )
    )

    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        video_size=cfg.video_size,
        audio_size=cfg.audio_size,
        video_fps=args.video_fps,
        audio_fps=args.audio_fps,
        num_workers=0,
        shard=0,
        num_shards=1,
        seed=args.seed,
    )

    # optional SR chain for the generated video (audio2video only)
    sr = None
    if args.sr_model_path and condition_key == "audio":
        sr_kwargs = args_to_dict(
            args, configs.image_sr_model_and_diffusion_defaults().keys()
        )
        sr_model, sr_diffusion = configs.image_sr_create_model_and_diffusion(**sr_kwargs)
        if args.sr_sample_fn == "ddim":
            sr_diffusion = configs.create_gaussian_diffusion(
                steps=sr_kwargs["sr_diffusion_steps"],
                learn_sigma=sr_kwargs["sr_learn_sigma"],
                noise_schedule=sr_kwargs["noise_schedule"],
                timestep_respacing=f"ddim{args.sr_sample_steps}",
            )
        sr_size = sr_model.cfg.image_size
        rng, k2 = jax.random.split(rng)
        sr_params = load_model_params(
            args.sr_model_path, sr_model, {"params": k2},
            (jnp.zeros((1, sr_size, sr_size, 3)), jnp.zeros((1,), jnp.int32),
             jnp.zeros((1, h, w, 3))),
        )
        sr = jax.jit(
            build_sr_sampler(sr_model, sr_diffusion, sr_params,
                             sample_fn=args.sr_sample_fn, steps=args.sr_sample_steps)
        )

    idx = 0
    while idx < args.sample_num:
        batch = next(data)
        gt = jnp.asarray(batch[condition_key])
        rng, k = jax.random.split(rng)
        out = jax.device_get(sampler(k, gt))
        for i in range(gt.shape[0]):
            base = os.path.join(args.output_dir, f"{save_prefix}_{idx:05d}")
            media.save_multimodal(
                out["video"][i], out["audio"][i], base,
                fps=args.video_fps, audio_rate=args.audio_fps,
            )
            # ground-truth reference for side-by-side inspection (ref saves
            # gt/reconstruct pairs, video2audio_sample.py:120-150)
            media.save_multimodal(
                np.asarray(batch["video"][i]), np.asarray(batch["audio"][i]),
                base + "_gt", fps=args.video_fps, audio_rate=args.audio_fps,
            )
            idx += 1
        if sr is not None:
            v = jnp.asarray(out["video"]).reshape(-1, h, w, c)
            rng, kn, ks = jax.random.split(rng, 3)
            x_T = shared_clip_noise(kn, out["video"].shape[0], f, sr_size)
            sr_frames = jax.device_get(sr(ks, v, x_T))
            sr_video = sr_frames.reshape(-1, f, sr_size, sr_size, c)
            for i in range(sr_video.shape[0]):
                media.save_video(
                    sr_video[i],
                    os.path.join(args.output_dir, f"{save_prefix}_{idx - gt.shape[0] + i:05d}_sr.mp4"),
                    fps=args.video_fps,
                )
        log.log(f"{idx}/{args.sample_num} samples written")


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = create_argparser().parse_args(argv)
    run_conditional(args, condition_key="audio", save_prefix="a2v")


if __name__ == "__main__":
    main()
