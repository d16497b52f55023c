"""Training tasks: the model-specific pieces the generic TrainLoop delegates.

The reference ships two near-duplicate TrainLoops — multimodal
(`multimodal_train_util.py:25`) and single-modal (`train_util.py:34`), the
latter dispatching previews on model attributes (`run_loop`,
train_util.py:300-309: ``low_res`` cond -> save_sr, ``video_size`` ->
save_visual, ``audio_size`` -> save_audio).  Here one TrainLoop owns the
SPMD step/checkpoint/log machinery and a small Task object owns what varies:

* ``init_params``   — dummy-shape model init
* ``adapter``       — microbatch -> (x_start, bound model_fn) for the step
* ``train_rngs``    — which PRNG collections the model consumes in training
* ``preview``       — EMA-weight sampling + media dump at save intervals
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import logger as kvlogger


class MultimodalTask:
    """Joint AV training on the coupled MM-UNet (the default task;
    parity: multimodal_train_util.py:25-549)."""

    train_rngs = ("shift", "dropout")

    def init_params(self, model, rng):
        cfg = model.cfg
        f, c, h, w = cfg.video_size
        ca, l = cfg.audio_size
        k_init, k_shift = jax.random.split(rng)
        variables = jax.jit(model.init)(
            {"params": k_init, "shift": k_shift},
            jnp.zeros((1, f, h, w, c), jnp.float32),
            jnp.zeros((1, l, ca), jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
        return variables["params"]

    def adapter(self, model):
        return None  # make_train_step's default multimodal adapter

    def preview(self, loop, step: int):
        """EMA-weight preview sampling + media dump
        (parity: save_video, multimodal_train_util.py:348-468)."""
        from ..data import media
        from ..parallel import batch_sharding

        params = loop.state.ema[next(iter(loop.state.ema))]
        # Shard the preview batch over the mesh whenever it divides — the
        # same SPMD decomposition as the training step, so previews on a
        # multi-chip mesh cost 1/N of a replicated run.
        out_sh = None
        if loop.mesh is not None and loop.mesh.size > 1:
            if loop.preview_samples % loop.mesh.size == 0:
                out_sh = batch_sharding(loop.mesh)
        sample = jax.jit(
            loop.make_sampling_fn(params), static_argnums=(1,), out_shardings=out_sh
        )
        loop.rng, k = jax.random.split(loop.rng)
        out = jax.device_get(sample(k, loop.preview_samples))
        vids = np.asarray(out["video"])
        auds = np.asarray(out["audio"])
        base = f"{loop.output_dir}/previews/step_{step:06d}"
        media.save_video_grid(vids, base + "_grid.mp4")
        for i in range(vids.shape[0]):
            media.save_multimodal(vids[i], auds[i], f"{base}_{i:02d}")
        kvlogger.log(f"wrote preview samples -> {base}*")
        return base + "_grid.mp4"


class ImageSRTask:
    """64->256 image super-resolution training: batches
    ``{"high_res": [B,H,W,3], "low_res": [B,h,w,3]}``
    (parity: train_util.py forward with ``low_res`` cond + save_sr :566-671)."""

    train_rngs = ("dropout",)

    def __init__(self, large_size: int, small_size: int, preview_steps: int = 25):
        self.large = large_size
        self.small = small_size
        self.preview_steps = preview_steps

    def init_params(self, model, rng):
        variables = jax.jit(model.init)(
            {"params": rng},
            jnp.zeros((1, self.large, self.large, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, self.small, self.small, 3), jnp.float32),
        )
        return variables["params"]

    def adapter(self, model):
        def adapt(params, micro, rngs):
            def model_fn(x, t_model):
                return model.apply(
                    {"params": params}, x, t_model, micro["low_res"],
                    train=True, rngs=rngs,
                )

            return micro["high_res"], model_fn

        return adapt

    def preview(self, loop, step: int):
        """bicubic | sample | ground-truth triptych (parity: save_sr,
        train_util.py:566-671), conditioned on the last training batch."""
        import cv2

        from ..configs import create_gaussian_diffusion
        from ..data import media
        from ..sampling import build_sr_sampler

        batch = loop.last_batch
        if batch is None:
            return
        params = loop.state.ema[next(iter(loop.state.ema))]
        sr_diffusion = create_gaussian_diffusion(
            steps=loop.diffusion.num_timesteps,
            learn_sigma=(loop.model.cfg.out_channels == 6),
            timestep_respacing=f"ddim{self.preview_steps}",
        )
        sampler = jax.jit(
            build_sr_sampler(loop.model, sr_diffusion, params, "ddim",
                             steps=self.preview_steps)
        )
        low = jnp.asarray(batch["low_res"][:4])
        hr = np.asarray(batch["high_res"][:4])
        loop.rng, k = jax.random.split(loop.rng)
        sample = np.asarray(jax.device_get(sampler(k, low)))
        large = hr.shape[1]
        bic = np.stack([
            cv2.resize(np.asarray(l), (large, large), interpolation=cv2.INTER_CUBIC)
            for l in np.asarray(low)
        ])
        rows = [
            np.concatenate([bic[i], sample[i], hr[i]], axis=1) for i in range(len(hr))
        ]
        out_path = f"{loop.output_dir}/previews/step_{step:06d}.png"
        media.save_image(np.concatenate(rows, axis=0), out_path)
        kvlogger.log(f"wrote SR preview -> {out_path}")
        return out_path


class SingleModalTask:
    """Plain video or audio diffusion training: batches ``{"x": [B, ...]}``
    over a :class:`~..models.single_unet.SingleModalUNet`.

    Previews reproduce the reference flows — video: EMA sample grid written
    as gif/mp4 (parity: save_visual, train_util.py:399-483); audio: per-sample
    wav files (parity: save_audio, train_util.py:485-564).
    """

    train_rngs = ("dropout",)

    def __init__(self, sample_fn: str = "ddim", preview_steps: int = 50):
        self.sample_fn = sample_fn
        self.preview_steps = preview_steps

    def init_params(self, model, rng):
        shape = model.cfg.sample_shape
        variables = jax.jit(model.init)(
            {"params": rng},
            jnp.zeros((1,) + shape, jnp.float32),
            jnp.zeros((1,), jnp.int32),
        )
        return variables["params"]

    def adapter(self, model):
        def adapt(params, micro, rngs):
            def model_fn(x, t_model):
                return model.apply({"params": params}, x, t_model, train=True, rngs=rngs)

            return micro["x"], model_fn

        return adapt

    def preview(self, loop, step: int):
        from ..data import media
        from ..sampling import build_single_sampler

        params = loop.state.ema[next(iter(loop.state.ema))]
        sampler = jax.jit(
            build_single_sampler(
                loop.model, loop.diffusion, params,
                sample_fn=self.sample_fn, steps=self.preview_steps,
            ),
            static_argnums=(1,),
        )
        loop.rng, k = jax.random.split(loop.rng)
        out = np.asarray(jax.device_get(sampler(k, loop.preview_samples)))
        base = f"{loop.output_dir}/previews/step_{step:06d}"
        if loop.model.cfg.modality == "video":
            media.save_video_grid(out, base + "_grid.mp4")
            kvlogger.log(f"wrote video preview grid -> {base}_grid.mp4")
            return base + "_grid.mp4"
        for i in range(out.shape[0]):
            media.save_audio(out[i], f"{base}_{i:02d}.wav")
        kvlogger.log(f"wrote {out.shape[0]} audio previews -> {base}_*.wav")
        return f"{base}_00.wav"
