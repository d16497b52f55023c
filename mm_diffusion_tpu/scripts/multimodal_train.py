"""Train the multimodal (joint audio-video) diffusion model.

CLI-parity re-design of `py_scripts/multimodal_train.py` (flag surface from
its create_argparser, :85-115): the same model/diffusion/training flags, but
executing as one SPMD process over a JAX device mesh instead of
mpiexec-per-GPU.  ``--data_dir synthetic`` trains on the procedural dataset.

Example (reference launch translated):
    python -m mm_diffusion_tpu.scripts.multimodal_train \
        --data_dir /data/landscape/train --output_dir /tmp/run \
        --video_size 16,3,64,64 --audio_size 1,25600 \
        --cross_attention_resolutions 2,4,8 --cross_attention_windows 1,4,8 \
        --cross_attention_shift True --video_attention_resolutions 2,4,8 \
        --batch_size 32 --lr 1e-4
"""

from __future__ import annotations

import argparse

from .. import configs
from ..configs import add_dict_to_argparser, args_to_dict, create_gaussian_diffusion
from ..data.video import load_data
from ..models.mm_unet import MultimodalUNet
from ..parallel import make_mesh, process_data_shard
from ..train import TrainLoop
from ..utils import logger


def create_argparser():
    defaults = dict(
        data_dir="synthetic",
        schedule_sampler="uniform",
        lr=1e-4,
        seed=42,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=4,  # GLOBAL batch (the reference's is per-GPU)
        num_workers=4,
        save_type="mp4",
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=100,
        devices=None,  # unused: the mesh uses all visible devices
        save_interval=10000,
        output_dir="./output",
        resume_checkpoint="",
        use_db=False,
        sample_fn="dpm_solver",
        frame_gap=1,
        video_fps=10,
        audio_fps=16000,
        max_steps=0,
        n_fsdp=1,
        fsdp_min_size=2**18,  # smallest param (elements) to shard over fsdp
    )
    defaults.update(configs.model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = create_argparser().parse_args(argv)
    logger.configure(args.output_dir)
    log = logger.get_current()

    log.log("creating model and diffusion...")
    model_kwargs = args_to_dict(args, configs.model_and_diffusion_defaults().keys())
    cfg = configs.create_model_config(**model_kwargs)
    model = MultimodalUNet(cfg)
    diffusion = create_gaussian_diffusion(
        steps=args.diffusion_steps,
        learn_sigma=args.learn_sigma,
        noise_schedule=args.noise_schedule,
        use_kl=args.use_kl,
        predict_xstart=args.predict_xstart,
        rescale_timesteps=args.rescale_timesteps,
        rescale_learned_sigmas=args.rescale_learned_sigmas,
        timestep_respacing=args.timestep_respacing,
    )

    log.log("creating data loader...")
    shard, num_shards = process_data_shard()
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        video_size=cfg.video_size,
        audio_size=cfg.audio_size,
        video_fps=args.video_fps,
        audio_fps=args.audio_fps,
        num_workers=args.num_workers,
        shard=shard,
        num_shards=num_shards,
        seed=args.seed,
    )

    mesh = make_mesh(n_fsdp=args.n_fsdp)
    log.log(f"mesh: {mesh}")
    accum = 1 if args.microbatch <= 0 else max(1, args.batch_size // args.microbatch)

    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=args.batch_size,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        output_dir=args.output_dir,
        resume_checkpoint=args.resume_checkpoint or None,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        schedule_sampler=args.schedule_sampler,
        accum_steps=accum,
        mesh=mesh,
        seed=args.seed,
        sample_fn=args.sample_fn,
        min_size_to_shard=args.fsdp_min_size,
        use_db=args.use_db,
    )
    log.log("training...")
    loop.run_loop(max_steps=args.max_steps or None)


if __name__ == "__main__":
    main()
