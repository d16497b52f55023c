"""Ancestral (DDPM) and DDIM sampling loops, plus the zero-shot conditional
loops (replacement and gradient guidance).

TPU-native re-design of the reference's Python-loop samplers
(`multimodal_gaussian_diffusion.py:476-819,:955-1046`): every loop is a
``jax.lax.scan`` over the timestep index, so the whole trajectory compiles to
one XLA program with static shapes.  The gradient-guided conditional loop
(ref :722-819) becomes ``jax.grad`` of a one-step function inside the scan —
no autograd-context juggling or manual 2**20 loss scaling (we run fp32 state).

Model signature used throughout:
    ``model_fn(x_pytree, t_model, step_rng) -> model_out_pytree``
where ``step_rng`` feeds per-step stochastic model behaviour (the RS-MMA
random window shift).  Pass ``None``-tolerant wrappers if unused.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..diffusion.gaussian import GaussianDiffusion, mean_flat

PyTree = Any
StepModelFn = Callable[[PyTree, jnp.ndarray, jax.Array], PyTree]


def _batch_size(x: PyTree) -> int:
    return jax.tree_util.tree_leaves(x)[0].shape[0]


def p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: StepModelFn,
    x_T: PyTree,
    rng: jax.Array,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    return_trajectory: bool = False,
) -> PyTree:
    """Full ancestral sampling from x_T (parity: ref :476-582), as a scan.

    With ``return_trajectory=True`` also returns the per-step intermediates
    stacked on a leading axis ordered t=T-1..0 (parity:
    p_sample_loop_progressive, multimodal_gaussian_diffusion.py:523-582 —
    the reference yields; here the scan's ys carry the whole trajectory, so
    memory is num_timesteps x state — use respaced diffusions for long runs).
    Returns ``(x_0, trajectory)`` in that mode, else just ``x_0``.
    """
    b = _batch_size(x_T)
    n = diffusion.num_timesteps

    def body(carry, i):
        x, rng = carry
        rng, k_noise, k_model = jax.random.split(rng, 3)
        t = jnp.full((b,), i, dtype=jnp.int32)
        out = diffusion.p_sample(
            lambda xx, tt: model_fn(xx, tt, k_model),
            x,
            t,
            k_noise,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
        )
        return (out["sample"], rng), (out["sample"] if return_trajectory else None)

    (x, _), traj = jax.lax.scan(body, (x_T, rng), jnp.arange(n - 1, -1, -1))
    return (x, traj) if return_trajectory else x


def ddim_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: StepModelFn,
    x_T: PyTree,
    rng: jax.Array,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    eta: float = 0.0,
    return_trajectory: bool = False,
) -> PyTree:
    """DDIM sampling loop (parity: ref :955-1046).  ``return_trajectory``
    as in :func:`p_sample_loop` (parity: ddim_sample_loop_progressive)."""
    b = _batch_size(x_T)
    n = diffusion.num_timesteps

    def body(carry, i):
        x, rng = carry
        rng, k_noise, k_model = jax.random.split(rng, 3)
        t = jnp.full((b,), i, dtype=jnp.int32)
        out = diffusion.ddim_sample(
            lambda xx, tt: model_fn(xx, tt, k_model),
            x,
            t,
            k_noise,
            clip_denoised=clip_denoised,
            denoised_fn=denoised_fn,
            cond_fn=cond_fn,
            eta=eta,
        )
        return (out["sample"], rng), (out["sample"] if return_trajectory else None)

    (x, _), traj = jax.lax.scan(body, (x_T, rng), jnp.arange(n - 1, -1, -1))
    return (x, traj) if return_trajectory else x


def ddim_reverse_loop(
    diffusion: GaussianDiffusion,
    model_fn: StepModelFn,
    x_0: PyTree,
    rng: jax.Array,
    clip_denoised: bool = True,
) -> PyTree:
    """Deterministic DDIM encoding x_0 -> x_T (parity: ref :903-953)."""
    b = _batch_size(x_0)
    n = diffusion.num_timesteps

    def body(carry, i):
        x, rng = carry
        rng, k_model = jax.random.split(rng)
        t = jnp.full((b,), i, dtype=jnp.int32)
        out = diffusion.ddim_reverse_sample(
            lambda xx, tt: model_fn(xx, tt, k_model), x, t, clip_denoised=clip_denoised
        )
        return (out["sample"], rng), None

    (x, _), _ = jax.lax.scan(body, (x_0, rng), jnp.arange(n))
    return x


def p_sample_loop_diverse(
    diffusion: GaussianDiffusion,
    model_fn: StepModelFn,
    x_T: PyTree,
    rng: jax.Array,
    random_num: int = 10,
    random_step=(899, 999),
    clip_denoised: bool = True,
) -> PyTree:
    """N diversified trajectories from ONE shared x_T: ancestral noise is
    shared across copies at every step except inside the ``random_step``
    window, where each copy draws independently — so the samples differ only
    through that window (parity: p_sample_loop_progressive_random,
    gaussian_diffusion.py:561-624).

    Returns a pytree whose leaves have a leading ``random_num`` axis.
    """
    b = _batch_size(x_T)
    n = diffusion.num_timesteps
    rs0, rs1 = random_step
    imgs = jax.tree.map(lambda l: jnp.broadcast_to(l[None], (random_num,) + l.shape), x_T)

    def body(carry, i):
        imgs, rng = carry
        rng, k_model, k_shared = jax.random.split(rng, 3)
        t = jnp.full((b,), i, dtype=jnp.int32)
        in_window = jnp.logical_and(i > rs0, i <= rs1)

        def sample_one(img, r_idx):
            # shared key outside the window (fold with 0 for every copy),
            # per-copy key inside it
            k = jax.random.fold_in(k_shared, r_idx * in_window.astype(jnp.int32))
            out = diffusion.p_sample(
                lambda xx, tt: model_fn(xx, tt, k_model),
                img,
                t,
                k,
                clip_denoised=clip_denoised,
            )
            return out["sample"]

        imgs = jax.vmap(sample_one)(imgs, jnp.arange(random_num))
        return (imgs, rng), None

    (imgs, _), _ = jax.lax.scan(body, (imgs, rng), jnp.arange(n - 1, -1, -1))
    return imgs


def conditional_p_sample_loop(
    diffusion: GaussianDiffusion,
    model_fn: StepModelFn,
    x_T: PyTree,
    rng: jax.Array,
    condition: PyTree,
    condition_key: str,
    class_scale: float = 0.0,
    clip_denoised: bool = True,
) -> PyTree:
    """Zero-shot conditional generation (audio->video / video->audio).

    ``condition`` is the ground-truth modality (e.g. ``{"audio": gt_audio}``
    value array); ``condition_key`` names it.  With ``class_scale == 0`` the
    replacement method is used (parity: ref :642-720): at each step the known
    modality is re-noised with a *fixed* noise draw and overwritten.  With
    ``class_scale > 0`` the gradient method (parity: ref :722-819): the free
    modality additionally descends the gradient of the replacement-consistency
    MSE through one p_sample step, scaled by ``class_scale * sqrt(alpha_bar_t)``.
    """
    keys = sorted(x_T.keys())
    assert condition_key in keys
    (target_key,) = [k for k in keys if k != condition_key]
    b = _batch_size(x_T)
    n = diffusion.num_timesteps
    tb = diffusion.tables

    # The fixed noise used to re-noise the condition each step is the initial
    # x_T draw itself, matching ref :668-676 (x = noise.copy()).
    fixed_noise = x_T

    def replace_cond(x, t):
        noised = diffusion.q_sample(
            {condition_key: condition}, t, {condition_key: fixed_noise[condition_key]}
        )
        return {**x, condition_key: noised[condition_key]}

    if class_scale == 0.0:

        def body(carry, i):
            x, rng = carry
            rng, k_noise, k_model = jax.random.split(rng, 3)
            t = jnp.full((b,), i, dtype=jnp.int32)
            x = replace_cond(x, t)
            out = diffusion.p_sample(
                lambda xx, tt: model_fn(xx, tt, k_model),
                x,
                t,
                k_noise,
                clip_denoised=clip_denoised,
            )
            return (out["sample"], rng), None

    else:

        def body(carry, i):
            x, rng = carry
            rng, k_noise, k_model = jax.random.split(rng, 3)
            t = jnp.full((b,), i, dtype=jnp.int32)
            x = replace_cond(x, t)
            # x_{t-1}-noised condition as the consistency target.  At i==0 the
            # gradient update is masked out, so the clamp of t-1 is harmless.
            tm1 = jnp.maximum(t - 1, 0)
            prev_cond = diffusion.q_sample(
                {condition_key: condition}, tm1, {condition_key: fixed_noise[condition_key]}
            )[condition_key]

            def step_loss(x_target_leaf):
                x_full = {**x, target_key: x_target_leaf}
                out = diffusion.p_sample(
                    lambda xx, tt: model_fn(xx, tt, k_model),
                    x_full,
                    t,
                    k_noise,
                    clip_denoised=clip_denoised,
                )
                prev = out["sample"]
                loss = jnp.mean(mean_flat((prev[condition_key] - prev_cond) ** 2))
                return loss, prev

            grad, prev = jax.grad(step_loss, has_aux=True)(x[target_key])
            mask = (t != 0).astype(jnp.float32).reshape(
                t.shape + (1,) * (x[target_key].ndim - 1)
            )
            sqrt_abar = tb.sqrt_alphas_cumprod[i]
            new_target = prev[target_key] - mask * grad * class_scale * sqrt_abar
            x_next = {**prev, target_key: new_target}
            return (x_next, rng), None

    (x, _), _ = jax.lax.scan(body, (x_T, rng), jnp.arange(n - 1, -1, -1))
    return x
