"""Unconditional joint AV sampling + chained 64->256 frame super-resolution.

CLI-parity re-design of `py_scripts/multimodal_sample_sr.py:29-275`: base
model sampling via DPM-Solver(++)/ddpm/ddim, per-frame SR with per-clip
shared noise, media dump, optional eval.  Checkpoints are Orbax param
snapshots (or full train-state dirs); pass ``--multimodal_model_path random``
to smoke-test the pipeline with random weights.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from .. import configs
from ..configs import add_dict_to_argparser, args_to_dict
from ..data import media
from ..models.mm_unet import MultimodalUNet
from ..sampling import build_base_sampler, build_sr_sampler, sample_base_and_sr
from ..utils import logger


def create_argparser():
    defaults = dict(
        multimodal_model_path="random",
        sr_model_path="random",
        output_dir="./samples",
        batch_size=1,
        sample_num=4,
        sample_fn="dpm_solver",
        sr_sample_fn="ddim",
        skip_steps=0,
        seed=42,
        save_type="mp4",
        video_fps=10,
        audio_fps=16000,
        classifier_scale=0.0,
        run_eval=False,
        ref_path="",
        sample_steps=20,
        sr_sample_steps=50,
        n_sample_data=1,
    )
    defaults.update(configs.model_and_diffusion_defaults())
    defaults.update(configs.image_sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def load_model_params(path: str, model, init_rngs, dummy_args):
    """Load model params from any supported source:

    * ``random`` — fresh init (pipeline smoke tests),
    * ``*.pt`` / ``*.pth`` / ``*.ckpt`` — reference / guided-diffusion torch
      checkpoints through the import shims (published weights run unchanged
      from every CLI — parity: py_scripts' direct torch loads),
    * anything else — Orbax param snapshot or train-state dir.
    """
    variables = jax.jit(model.init)(init_rngs, *dummy_args)
    if path == "random":
        return variables["params"]
    if path.endswith((".pt", ".pth", ".ckpt")):
        return _load_torch_params(path, model)
    from ..train.checkpoint import restore_params

    return restore_params(path, variables["params"])


def _load_torch_params(path: str, model):
    from ..models.image_unet import ImageSuperResModel, ImageUNet
    from ..models.mm_unet import MultimodalUNet
    from ..train.torch_import import (
        load_torch_checkpoint,
        load_torch_image_checkpoint,
    )

    if isinstance(model, MultimodalUNet):
        return load_torch_checkpoint(path, model.cfg)
    if isinstance(model, ImageSuperResModel):
        return load_torch_image_checkpoint(path, model.cfg, super_res=True)
    if isinstance(model, ImageUNet):
        return load_torch_image_checkpoint(path, model.cfg)
    raise ValueError(f"no torch import shim for model type {type(model).__name__}")


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = create_argparser().parse_args(argv)
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
    sr_kwargs = args_to_dict(args, configs.image_sr_model_and_diffusion_defaults().keys())
    sr_model, sr_diffusion = configs.image_sr_create_model_and_diffusion(**sr_kwargs)
    if args.sr_sample_fn in ("ddim",):
        sr_diffusion = configs.create_gaussian_diffusion(
            steps=sr_kwargs["sr_diffusion_steps"],
            learn_sigma=sr_kwargs["sr_learn_sigma"],
            noise_schedule=sr_kwargs["noise_schedule"],
            timestep_respacing=f"ddim{min(args.sr_sample_steps, 250)}",
        )

    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    rng = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(rng)

    log.log("loading base model params...")
    params = load_model_params(
        args.multimodal_model_path,
        model,
        {"params": k1, "shift": k1},
        (jnp.zeros((1, f, h, w, c)), jnp.zeros((1, l, ca)), jnp.zeros((1,), jnp.int32)),
    )
    log.log("loading SR model params...")
    sr_size = sr_model.cfg.image_size
    sr_params = load_model_params(
        args.sr_model_path,
        sr_model,
        {"params": k2},
        (
            jnp.zeros((1, sr_size, sr_size, 3)),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, h, w, 3)),
        ),
    )

    out_shardings = None
    if args.n_sample_data > 1:
        # Shard the sampling batch over a data mesh — the TPU equivalent of
        # the reference's per-GPU sampling ranks (multimodal_sample_sr.sh
        # mpiexec -n 4): GSPMD partitions every batch-leading tensor in the
        # whole base+SR chain; jax.random values are sharding-invariant so
        # results are bit-identical to the single-device run.
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS, make_mesh, replicated

        if args.batch_size % args.n_sample_data != 0:
            raise ValueError(
                f"batch_size {args.batch_size} must divide over "
                f"n_sample_data={args.n_sample_data}"
            )
        mesh = make_mesh(n_data=args.n_sample_data, n_fsdp=1)
        from ..ops.block_attention import set_kernel_mesh

        set_kernel_mesh(mesh)  # kernels shard_map over the batch axis
        params = jax.device_put(params, replicated(mesh))
        sr_params = jax.device_put(sr_params, replicated(mesh))
        out_shardings = NamedSharding(mesh, P(DATA_AXIS))

    base = build_base_sampler(
        model, diffusion, params, sample_fn=args.sample_fn, steps=args.sample_steps
    )
    sr = build_sr_sampler(
        sr_model, sr_diffusion, sr_params,
        sample_fn=args.sr_sample_fn, steps=args.sr_sample_steps,
    )
    # sharded runs batch all frames through one SR call: lax.map over clips
    # would all-gather the sharded batch (see sample_base_and_sr docstring)
    fn = lambda r: sample_base_and_sr(
        base, sr, r, args.batch_size, sr_size, f,
        sr_all_frames=args.n_sample_data > 1,
    )
    pipeline = jax.jit(fn, out_shardings=out_shardings)

    n_batches = (args.sample_num + args.batch_size - 1) // args.batch_size
    idx = 0
    # --save_type npz: one OpenAI-style batch file instead of per-sample
    # media (arr_0 uint8 video + audio + fps metadata, evaluation/npz_batch.py)
    # — eval_multimodal and scripts/image_eval.py consume it directly.
    npz_accum = {"video": [], "audio": [], "base": []} if args.save_type == "npz" else None
    for b in range(n_batches):
        rng, k = jax.random.split(rng)
        out = jax.device_get(pipeline(k))
        if npz_accum is not None:
            npz_accum["video"].append(out["sr_video"])
            npz_accum["audio"].append(out["audio"])
            npz_accum["base"].append(out["video"])
            idx += args.batch_size
        else:
            for i in range(args.batch_size):
                base_path = os.path.join(args.output_dir, f"sample_{idx:05d}")
                media.save_multimodal(
                    out["sr_video"][i], out["audio"][i], base_path,
                    fps=args.video_fps, audio_rate=args.audio_fps,
                )
                media.save_video(out["video"][i], base_path + "_base64.mp4", fps=args.video_fps)
                idx += 1
        log.log(f"batch {b + 1}/{n_batches} written ({idx} samples)")

    sample_path = args.output_dir
    if npz_accum is not None:
        import numpy as np

        from ..evaluation.npz_batch import save_av_npz_batch

        sample_path = save_av_npz_batch(
            os.path.join(
                args.output_dir, f"{args.sample_fn}_samples_{idx}.npz"
            ),
            np.concatenate(npz_accum["video"]),
            np.concatenate(npz_accum["audio"]),
            video_fps=args.video_fps,
            audio_fps=args.audio_fps,
            extra_arrays={
                "video_base": np.concatenate(npz_accum["base"]).astype(np.float32)
            },
        )
        log.log(f"npz batch written: {sample_path}")

    if args.run_eval and args.ref_path:
        from ..evaluation import eval_multimodal

        metrics = eval_multimodal(args.ref_path, sample_path)
        log.log(f"eval: {metrics}")


if __name__ == "__main__":
    main()
