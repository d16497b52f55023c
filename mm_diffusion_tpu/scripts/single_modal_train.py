"""Train a single-modality (plain video or plain audio) diffusion model.

The reference exposes this flow as a library path, not a script: its
single-modal ``train_util.TrainLoop`` dispatches previews on model attributes
(`mm_diffusion/train_util.py:300-309` — ``video_size`` -> save_visual,
``audio_size`` -> save_audio) but no ``py_scripts/`` entry drives it.  This
CLI makes the capability usable end-to-end: it trains a
:class:`~mm_diffusion_tpu.models.single_unet.SingleModalUNet` on the video or
audio stream of the same datasets the multimodal trainer reads, under the
same SPMD TrainLoop (grad accumulation, fsdp sharding, async Orbax saves).

Example:
    python -m mm_diffusion_tpu.scripts.single_modal_train \
        --modality video --data_dir synthetic --output_dir /tmp/run \
        --video_size 16,3,64,64 --batch_size 4 --lr 1e-4
"""

from __future__ import annotations

from .. import configs
from ..configs import add_dict_to_argparser, args_to_dict, create_gaussian_diffusion
from ..data.video import load_data
from ..models.single_unet import SingleModalUNet, SingleUNetConfig
from ..parallel import make_mesh, process_data_shard
from ..train import TrainLoop
from ..train.tasks import SingleModalTask
from ..utils import logger


def single_model_defaults():
    """Flag surface: the MM-UNet model flags that apply to one stream
    (multimodal_script_util.py:28-55 minus the cross-modal knobs), plus
    ``modality`` to select it."""
    return dict(
        modality="video",
        video_size="16,3,64,64",
        audio_size="1,25600",
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        attention_resolutions="2,4,8",
        channel_mult="",
        dropout=0.0,
        class_cond=False,
        use_scale_shift_norm=True,
        resblock_updown=True,
        video_type="2d+1d",
        use_fp16=False,  # accepted for CLI parity; bf16 compute regardless
        learn_sigma=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=False,
        rescale_learned_sigmas=False,
        use_checkpoint=False,
    )


def create_argparser():
    defaults = dict(
        data_dir="synthetic",
        schedule_sampler="uniform",
        lr=1e-4,
        seed=42,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=4,  # GLOBAL batch
        num_workers=4,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=100,
        save_interval=10000,
        output_dir="./output",
        resume_checkpoint="",
        use_db=False,
        sample_fn="ddim",
        preview_steps=50,
        frame_gap=1,
        video_fps=10,
        audio_fps=16000,
        max_steps=0,
        n_fsdp=1,
        fsdp_min_size=2**18,
    )
    defaults.update(single_model_defaults())
    import argparse

    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def create_single_config(**kw) -> SingleUNetConfig:
    video_size = tuple(int(x) for x in str(kw["video_size"]).split(","))
    audio_size = tuple(int(x) for x in str(kw["audio_size"]).split(","))
    if kw["channel_mult"]:
        channel_mult = tuple(int(x) for x in str(kw["channel_mult"]).split(","))
    else:
        channel_mult = (1, 2, 3, 4)
    out_ch = video_size[1] if kw["modality"] == "video" else audio_size[0]
    if kw["learn_sigma"]:
        out_ch *= 2
    attn = tuple(int(x) for x in str(kw["attention_resolutions"]).split(","))
    if kw["class_cond"]:
        raise NotImplementedError(
            "class_cond single-modal training is dead code in the reference "
            "(train_util.py:414 'y' kwarg); not supported"
        )
    return SingleUNetConfig(
        modality=kw["modality"],
        video_size=video_size,
        audio_size=audio_size,
        model_channels=kw["num_channels"],
        out_channels=out_ch,
        num_res_blocks=kw["num_res_blocks"],
        attention_resolutions=attn,
        channel_mult=channel_mult,
        dropout=kw["dropout"],
        num_heads=kw["num_heads"],
        use_scale_shift_norm=kw["use_scale_shift_norm"],
        resblock_updown=kw["resblock_updown"],
        video_type=kw["video_type"],
        use_checkpoint=kw["use_checkpoint"],
    )


def single_stream(data, modality: str):
    """Adapt the AV loader's ``{"video", "audio"}`` batches to ``{"x": ...}``."""
    key = "video" if modality == "video" else "audio"
    for batch in data:
        yield {"x": batch[key]}


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = create_argparser().parse_args(argv)
    logger.configure(args.output_dir)
    log = logger.get_current()

    log.log(f"creating single-modal {args.modality} model and diffusion...")
    cfg = create_single_config(
        **args_to_dict(args, single_model_defaults().keys())
    )
    model = SingleModalUNet(cfg)
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
    data = single_stream(
        load_data(
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
        ),
        args.modality,
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
        task=SingleModalTask(sample_fn=args.sample_fn, preview_steps=args.preview_steps),
        use_db=args.use_db,
    )
    log.log("training...")
    loop.run_loop(max_steps=args.max_steps or None)


if __name__ == "__main__":
    main()
