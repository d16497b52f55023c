"""Train / finetune the 64->256 image super-resolution U-Net.

CLI-parity re-design of `py_scripts/image_sr_train.py:20-58` +
`mm_diffusion/train_util.py` (single-modal TrainLoop): trains the
ImageSuperResModel on (low_res, high_res) pairs.  The single-tensor diffusion
process is the same pytree `GaussianDiffusion`; conditioning enters via the
model's ``low_res`` kwarg.

Data: ``--data_dir synthetic`` generates procedural HR frames with bicubic
LR counterparts; a real image-folder path uses the degradation pipeline from
`real_image_datasets.py` semantics (downsample + optional noise/JPEG).
"""

from __future__ import annotations

import argparse
from typing import Dict, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import configs
from ..configs import add_dict_to_argparser, args_to_dict
from ..parallel import make_mesh, replicated, shard_batch
from ..train import checkpoint as ckpt_lib
from ..train.state import create_train_state, make_optimizer
from ..utils import logger


def synthetic_sr_data(batch_size: int, large: int, small: int, seed: int = 0
                      ) -> Iterator[Dict[str, np.ndarray]]:
    """Procedural (hr, lr) image pairs in [-1,1], channels-last."""
    import cv2

    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:large, 0:large].astype(np.float32) / large
    while True:
        hrs, lrs = [], []
        for _ in range(batch_size):
            f1, f2, ph = rng.uniform(2, 12), rng.uniform(2, 12), rng.uniform(0, 6.28)
            img = np.stack(
                [
                    np.sin(f1 * xs * 6.28 + ph + k) * np.cos(f2 * ys * 6.28 + k)
                    for k in range(3)
                ],
                axis=-1,
            ).astype(np.float32)
            lr = cv2.resize(img, (small, small), interpolation=cv2.INTER_CUBIC)
            hrs.append(img)
            lrs.append(lr)
        yield {"high_res": np.stack(hrs), "low_res": np.stack(lrs)}


# Real image folders go through data/image.load_sr_data — ONE degradation
# code path (bicubic + gaussian noise + JPEG artifacts,
# real_image_datasets.py:133-159 parity), gated by --degrade.


def save_sr_preview(model, diffusion, params, batch, out_path, steps=25, seed=0):
    """sr|sample|hr triptych dump (parity: save_sr, train_util.py:566-671):
    bicubic low-res upsample | model sample | ground truth, tiled side by side."""
    import cv2

    from ..data import media
    from ..sampling import build_sr_sampler
    from ..configs import create_gaussian_diffusion as _cgd

    sr_diffusion = _cgd(
        steps=1000, learn_sigma=(model.cfg.out_channels == 6),
        timestep_respacing=f"ddim{steps}",
    )
    sampler = jax.jit(
        build_sr_sampler(model, sr_diffusion, params, "ddim", steps=steps)
    )
    low = jnp.asarray(batch["low_res"][:4])
    hr = np.asarray(batch["high_res"][:4])
    sample = np.asarray(jax.device_get(sampler(jax.random.PRNGKey(seed), low)))
    large = hr.shape[1]
    bic = np.stack([
        cv2.resize(np.asarray(l), (large, large), interpolation=cv2.INTER_CUBIC)
        for l in np.asarray(low)
    ])
    rows = [np.concatenate([bic[i], sample[i], hr[i]], axis=1) for i in range(len(hr))]
    media.save_image(np.concatenate(rows, axis=0), out_path)


def create_argparser():
    defaults = dict(
        data_dir="synthetic",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        batch_size=4,
        ema_rate="0.9999",
        log_interval=100,
        save_interval=10000,
        output_dir="./sr_output",
        resume_checkpoint="",
        seed=42,
        max_steps=0,
        degrade=True,  # noise+JPEG LR degradations (real_image_datasets.py:133-159)
    )
    defaults.update(configs.image_sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


def main(argv=None):
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = create_argparser().parse_args(argv)
    logger.configure(args.output_dir)
    log = logger.get_current()

    sr_kwargs = args_to_dict(args, configs.image_sr_model_and_diffusion_defaults().keys())
    model, diffusion = configs.image_sr_create_model_and_diffusion(**sr_kwargs)
    large, small = args.large_size, args.small_size

    if args.data_dir == "synthetic":
        data = synthetic_sr_data(args.batch_size, large, small, args.seed)
    else:
        from ..data.image import load_sr_data

        data = load_sr_data(
            data_dir=args.data_dir,
            batch_size=args.batch_size,
            large_size=large,
            small_size=small,
            degrade=args.degrade,
            seed=args.seed,
        )

    k = jax.random.PRNGKey(args.seed)
    variables = jax.jit(model.init)(
        {"params": k},
        jnp.zeros((1, large, large, 3)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, small, small, 3)),
    )
    tx = make_optimizer(args.lr, args.weight_decay, args.lr_anneal_steps)
    from ..train.loop import parse_ema_rates

    state = create_train_state(
        variables["params"], tx, parse_ema_rates(args.ema_rate),
        num_timesteps=diffusion.num_timesteps,
    )
    ckpt_dir = f"{args.output_dir}/checkpoints"
    if args.resume_checkpoint.endswith((".pt", ".pth", ".ckpt")):
        # Initialize from a guided-diffusion torch checkpoint — the
        # reference's PRE_TRAIN_MODELS flow (train_util.py:26,191-216;
        # ssh_scripts/image_sr_train.sh:10 resumes 64_256_upsampler.pt).
        from ..train.torch_import import load_torch_image_checkpoint

        pretrain = jax.tree.map(
            jnp.asarray,
            load_torch_image_checkpoint(args.resume_checkpoint, model.cfg, super_res=True),
        )
        state = state.replace(
            params=pretrain,
            ema={r: jax.tree.map(jnp.copy, pretrain) for r in state.ema},
        )
        log.log(f"initialized from torch checkpoint {args.resume_checkpoint}")
    else:
        latest = ckpt_lib.latest_checkpoint_step(args.resume_checkpoint or ckpt_dir)
        if latest is not None:
            state = ckpt_lib.restore_checkpoint(
                args.resume_checkpoint or ckpt_dir, state, latest
            )
            log.log(f"resumed from step {latest}")

    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))

    def train_step(state, batch, rng):
        rng_t, rng_loss, k_drop = jax.random.split(jax.random.fold_in(rng, state.step), 3)
        b = batch["high_res"].shape[0]
        t, weights = state.sampler.sample(rng_t, b)

        def loss_fn(params):
            def model_fn(x, t_model):
                out = model.apply(
                    {"params": params}, x, t_model, batch["low_res"],
                    train=True, rngs={"dropout": k_drop},
                )
                return out

            terms = diffusion.training_losses(model_fn, batch["high_res"], t, rng_loss)
            return jnp.mean(terms["loss"] * weights), terms

        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = {
            r: jax.tree.map(lambda e, p, rr=float(r): e * rr + p * (1 - rr), et, params)
            for r, et in state.ema.items()
        }
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, ema=ema,
            sampler=state.sampler.update(t, terms["loss"]),
        )
        return new_state, {"loss": loss}

    step_fn = jax.jit(train_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(args.seed)
    import time

    t_last = time.time()
    while True:
        step = int(jax.device_get(state.step))
        if args.max_steps and step >= args.max_steps:
            break
        batch = shard_batch(next(data), mesh)
        rng, kk = jax.random.split(rng)
        state, metrics = step_fn(state, batch, kk)
        log.logkv_mean("loss", float(jax.device_get(metrics["loss"])))
        step += 1
        if step % args.log_interval == 0:
            log.logkv("step", step)
            log.logkv("steps_per_sec", args.log_interval / (time.time() - t_last))
            t_last = time.time()
            log.dumpkvs()
        if step % args.save_interval == 0:
            ckpt_lib.save_checkpoint(ckpt_dir, jax.device_get(state))
            try:
                ema_key = next(iter(state.ema))
                save_sr_preview(
                    model, diffusion, state.ema[ema_key], jax.device_get(batch),
                    f"{args.output_dir}/previews/step_{step:06d}.png",
                )
            except Exception as e:  # previews must never kill training
                log.log(f"sr preview failed: {e}")
    ckpt_lib.save_checkpoint(ckpt_dir, jax.device_get(state))


if __name__ == "__main__":
    main()
