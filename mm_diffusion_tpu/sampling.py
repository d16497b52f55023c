"""High-level sampling pipelines: base joint AV generation, the chained
64->256 frame super-resolution stage, and zero-shot conditional generation.

Re-design of the reference's sampling entry-point logic
(`py_scripts/multimodal_sample_sr.py:29-275`, `audio2video_sample_sr.py`,
`video2audio_sample.py`) as jit-compiled library functions shared by the CLI
scripts, the training-loop previews, and the benchmark.

Everything returned by the builders is a pure jittable function; scripts
jit once and loop.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .diffusion.gaussian import GaussianDiffusion, tree_randn_like
from .samplers import (
    DPMSolver,
    NoiseScheduleVP,
    conditional_p_sample_loop,
    ddim_sample_loop,
    model_input_time,
    p_sample_loop,
)

PyTree = Any


def mm_raw_model(model, params):
    """Adapter: flax MultimodalUNet -> diffusion dict-model with
    learned-variance stripping for solver use."""
    learn_sigma = model.cfg.video_out_channels == 6

    def raw(x, t_model, rng, strip_sigma: bool):
        v, a = model.apply(
            {"params": params}, x["video"], x["audio"], t_model, rngs={"shift": rng}
        )
        if strip_sigma and learn_sigma:
            v = v[..., : v.shape[-1] // 2]
            a = a[..., : a.shape[-1] // 2]
        return {"video": v, "audio": a}

    return raw


def build_base_sampler(
    model,
    diffusion: GaussianDiffusion,
    params,
    sample_fn: str = "dpm_solver",
    steps: int = 20,
    clip_denoised: bool = True,
) -> Callable[[jax.Array, int], Dict[str, jnp.ndarray]]:
    """Unconditional joint AV sampler (parity: multimodal_sample_sr.py:101-157).

    ``sample_fn``: 'dpm_solver' (order 3 singlestep logSNR, ref :125-131),
    'dpm_solver++' (order 2 multistep + thresholding), 'ddpm', 'ddim'.
    Returns ``sample(rng, n) -> {"video": [n,F,H,W,3], "audio": [n,L,1]}``.
    """
    cfg = model.cfg
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    raw = mm_raw_model(model, params)

    def noise_tree(rng, n):
        return tree_randn_like(
            rng,
            {
                "video": jnp.zeros((n, f, h, w, c), jnp.float32),
                "audio": jnp.zeros((n, l, ca), jnp.float32),
            },
        )

    if sample_fn in ("dpm_solver", "dpm_solver++"):
        ns = NoiseScheduleVP.from_alphas_cumprod(
            np.asarray(diffusion.tables.alphas_cumprod, np.float64)
        )

        def cont_model(x, t_cont):
            b = x["video"].shape[0]
            t_in = jnp.broadcast_to(
                jnp.atleast_1d(model_input_time(ns, t_cont)), (b,)
            )
            # fresh RS-MMA shift per NFE, keyed by the (deterministic) step time
            shift_rng = jax.random.fold_in(jax.random.PRNGKey(0), t_in[0])
            return raw(x, t_in, shift_rng, strip_sigma=True)

        solver = DPMSolver(
            cont_model,
            ns,
            predict_x0=(sample_fn == "dpm_solver++"),
            thresholding=(sample_fn == "dpm_solver++"),
        )
        order = 3 if sample_fn == "dpm_solver" else 2
        method = "singlestep" if sample_fn == "dpm_solver" else "multistep"

        def sample(rng, n):
            x_t = noise_tree(rng, n)
            return solver.sample(
                x_t, steps=steps, order=order, method=method, skip_type="logSNR"
            )

    elif sample_fn in ("ddpm", "ddim"):

        def model_fn(x, t_model, rng):
            return raw(x, t_model, rng, strip_sigma=False)

        loop = p_sample_loop if sample_fn == "ddpm" else ddim_sample_loop

        def sample(rng, n):
            rng, k = jax.random.split(rng)
            x_t = noise_tree(k, n)
            return loop(diffusion, model_fn, x_t, rng, clip_denoised=clip_denoised)

    else:
        raise ValueError(sample_fn)

    return sample


def build_conditional_sampler(
    model,
    diffusion: GaussianDiffusion,
    params,
    condition_key: str,
    class_scale: float = 0.0,
    clip_denoised: bool = True,
):
    """Zero-shot audio->video (condition_key='audio') or video->audio
    sampler (parity: conditional_p_sample_loop dispatch,
    multimodal_gaussian_diffusion.py:584-639).

    Returns ``sample(rng, condition_array) -> {"video","audio"}``.
    """
    cfg = model.cfg
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    raw = mm_raw_model(model, params)

    def model_fn(x, t_model, rng):
        return raw(x, t_model, rng, strip_sigma=False)

    def sample(rng, condition):
        n = condition.shape[0]
        rng, k = jax.random.split(rng)
        x_t = tree_randn_like(
            k,
            {
                "video": jnp.zeros((n, f, h, w, c), jnp.float32),
                "audio": jnp.zeros((n, l, ca), jnp.float32),
            },
        )
        return conditional_p_sample_loop(
            diffusion,
            model_fn,
            x_t,
            rng,
            condition=condition,
            condition_key=condition_key,
            class_scale=class_scale,
            clip_denoised=clip_denoised,
        )

    return sample


def build_sr_sampler(
    sr_model,
    sr_diffusion: GaussianDiffusion,
    sr_params,
    sample_fn: str = "ddim",
    steps: int = 50,
    clip_denoised: bool = True,
):
    """Frame super-resolution sampler (parity: the SR stage of
    multimodal_sample_sr.py:186-240 — ddim25 in the launch script, or
    50-step order-2 multistep DPM-Solver in the code default).

    Returns ``sr(rng, low_res [N,h,w,3]) -> [N,H,W,3]`` where the noise for
    all frames of one clip should be shared by the caller (ref :192-193 —
    handled in :func:`sample_base_and_sr`).
    """
    cfg = sr_model.cfg
    size = cfg.image_size
    learn_sigma = cfg.out_channels == 6

    def raw(x, t_model, low_res, strip_sigma: bool):
        out = sr_model.apply({"params": sr_params}, x, t_model, low_res)
        if strip_sigma and learn_sigma:
            out = out[..., : out.shape[-1] // 2]
        return out

    if sample_fn in ("dpm_solver", "dpm_solver++"):
        ns = NoiseScheduleVP.from_alphas_cumprod(
            np.asarray(sr_diffusion.tables.alphas_cumprod, np.float64)
        )

        def sr(rng, low_res, x_T=None):
            def cont_model(x, t_cont):
                b = x.shape[0]
                t_in = jnp.broadcast_to(
                    jnp.atleast_1d(model_input_time(ns, t_cont)), (b,)
                )
                return raw(x, t_in, low_res, strip_sigma=True)

            solver = DPMSolver(cont_model, ns, predict_x0=(sample_fn == "dpm_solver++"),
                               thresholding=(sample_fn == "dpm_solver++"))
            n = low_res.shape[0]
            if x_T is None:
                x_T = jax.random.normal(rng, (n, size, size, 3))
            return solver.sample(x_T, steps=steps, order=2, method="multistep",
                                 skip_type="time_uniform")

    elif sample_fn in ("ddim", "ddpm"):

        def sr(rng, low_res, x_T=None):
            def model_fn(x, t_model, step_rng):
                return raw(x, t_model, low_res, strip_sigma=False)

            n = low_res.shape[0]
            rng, k = jax.random.split(rng)
            if x_T is None:
                x_T = jax.random.normal(k, (n, size, size, 3))
            loop = p_sample_loop if sample_fn == "ddpm" else ddim_sample_loop
            return loop(sr_diffusion, model_fn, x_T, rng, clip_denoised=clip_denoised)

    else:
        raise ValueError(sample_fn)

    return sr


def build_single_sampler(
    model,
    diffusion: GaussianDiffusion,
    params,
    sample_fn: str = "ddim",
    steps: int = 50,
    clip_denoised: bool = True,
):
    """Unconditional sampler for a single-modal video/audio model
    (parity: the sampler dispatch inside save_visual/save_audio,
    train_util.py:426-446,:509-534).  Returns ``sample(rng, n) -> [n, ...]``.
    """
    cfg = model.cfg
    shape = cfg.sample_shape
    learn_sigma = cfg.out_channels == 2 * shape[-1]

    def raw(x, t_model, strip_sigma: bool):
        out = model.apply({"params": params}, x, t_model)
        if strip_sigma and learn_sigma:
            out = out[..., : out.shape[-1] // 2]
        return out

    if sample_fn in ("dpm_solver", "dpm_solver++"):
        ns = NoiseScheduleVP.from_alphas_cumprod(
            np.asarray(diffusion.tables.alphas_cumprod, np.float64)
        )

        def cont_model(x, t_cont):
            t_in = jnp.broadcast_to(
                jnp.atleast_1d(model_input_time(ns, t_cont)), (x.shape[0],)
            )
            return raw(x, t_in, strip_sigma=True)

        solver = DPMSolver(
            cont_model, ns, predict_x0=(sample_fn == "dpm_solver++"),
            thresholding=(sample_fn == "dpm_solver++"),
        )

        def sample(rng, n):
            x_T = jax.random.normal(rng, (n,) + shape)
            # save_visual's dpm path: 50 steps, order 2, time_uniform,
            # multistep (train_util.py:437-438)
            return solver.sample(
                x_T, steps=steps, order=2, method="multistep",
                skip_type="time_uniform",
            )

    elif sample_fn in ("ddpm", "ddim"):

        def model_fn(x, t_model, step_rng):
            return raw(x, t_model, strip_sigma=False)

        loop = p_sample_loop if sample_fn == "ddpm" else ddim_sample_loop

        def sample(rng, n):
            rng, k = jax.random.split(rng)
            x_T = jax.random.normal(k, (n,) + shape)
            return loop(diffusion, model_fn, x_T, rng, clip_denoised=clip_denoised)

    else:
        raise ValueError(sample_fn)

    return sample


def shared_clip_noise(rng: jax.Array, n_clips: int, frames: int, size: int) -> jnp.ndarray:
    """One noise image per clip, repeated across its frames
    (parity: repeat(noise,'b c h w -> (b repeat) c h w'),
    multimodal_sample_sr.py:192-193)."""
    base = jax.random.normal(rng, (n_clips, 1, size, size, 3))
    return jnp.tile(base, (1, frames, 1, 1, 1)).reshape(n_clips * frames, size, size, 3)


def sample_base_and_sr(
    base_sampler,
    sr_sampler,
    rng: jax.Array,
    n: int,
    sr_size: int,
    frames: int,
    sr_all_frames: bool = False,
):
    """Full pipeline: base joint AV sample -> per-frame SR with shared
    per-clip noise (parity: multimodal_sample_sr.py:101-240).

    By default the SR stage runs clip-by-clip under ``lax.map`` (one
    compiled 16-frame body, sequential over clips) so the 256^2 SR
    activations stay bounded at any base batch size; ``sr_all_frames=True``
    batches all n*frames frames through one SR call instead (the reference's
    layout, fine for small n).

    DATA-SHARDED runs must use ``sr_all_frames=True``: ``lax.map`` iterates
    over the batch axis, so GSPMD has to all-gather the sharded video onto
    every device and run all n clips everywhere — the exact replication
    fallback tests/test_sharded_sampling_hlo.py audits for.  The batched
    layout keeps the frames axis sharded (each device SRs only its own
    clips' frames), and per-device memory is n/n_devices clips — bounded by
    choosing batch_size accordingly.
    """
    rng, k_base, k_noise, k_sr = jax.random.split(rng, 4)
    out = base_sampler(k_base, n)
    video, audio = out["video"], out["audio"]
    b, f, h, w, c = video.shape
    if sr_all_frames or b == 1:
        low_res = video.reshape(b * f, h, w, c)
        x_T = shared_clip_noise(k_noise, b, f, sr_size)
        sr_frames = sr_sampler(k_sr, low_res, x_T)
        sr_video = sr_frames.reshape(b, f, sr_size, sr_size, c)
    else:

        def one_clip(args):
            idx, clip = args  # clip: [f, h, w, c]
            k_n = jax.random.fold_in(k_noise, idx)
            k_s = jax.random.fold_in(k_sr, idx)
            x_T = shared_clip_noise(k_n, 1, f, sr_size)
            return sr_sampler(k_s, clip, x_T)

        sr_video = jax.lax.map(one_clip, (jnp.arange(b), video))
    return {"video": video, "audio": audio, "sr_video": sr_video}
