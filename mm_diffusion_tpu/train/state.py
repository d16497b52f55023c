"""Train state and the jitted SPMD train step.

Re-design of the reference training stack (`multimodal_train_util.py` +
`fp16_util.py` + `train_util.py`):

* The entire ``fp16_util.py`` manual mixed-precision machinery (flattened
  fp32 master params, dynamic loss scaling, overflow step-skipping — 248 LoC)
  disappears: parameters and Adam state are fp32, the model computes in bf16,
  and there is no loss scale on TPU.
* DDP + `no_sync()` microbatching (multimodal_train_util.py:289-319) becomes
  a ``lax.scan`` gradient accumulation inside one jit — gradients psum once
  per step via the sharded-batch jit.
* EMA (nn.py:128-138) is a pytree lerp, one per rate.
* The loss-aware schedule sampler state lives inside the train state and is
  updated in-step (replacing resample.py's cross-rank all_gather).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.gaussian import GaussianDiffusion
from .resample import UniformSampler

PyTree = Any


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # int32 scalar
    params: PyTree  # fp32
    opt_state: Any
    ema: Dict[str, PyTree]  # rate-string -> fp32 params copy
    sampler: Any  # UniformSampler | LossSecondMomentResampler


def make_optimizer(
    lr: float,
    weight_decay: float = 0.0,
    lr_anneal_steps: int = 0,
    grad_clip: float = 0.0,
) -> optax.GradientTransformation:
    """AdamW with the reference's linear LR anneal
    (parity: multimodal_train_util.py:107 + _anneal_lr :332-337)."""
    if lr_anneal_steps:
        schedule = lambda step: lr * jnp.maximum(0.0, 1.0 - step / lr_anneal_steps)
    else:
        schedule = lr
    tx = optax.adamw(schedule, weight_decay=weight_decay)
    if grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(
    params: PyTree,
    tx: optax.GradientTransformation,
    ema_rates: Sequence[float] = (0.9999,),
    sampler=None,
    num_timesteps: int = 1000,
) -> TrainState:
    if sampler is None:
        sampler = UniformSampler(num_timesteps=num_timesteps)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema={str(r): jax.tree.map(jnp.copy, params) for r in ema_rates},
        sampler=sampler,
    )


def _global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32))) for l in jax.tree_util.tree_leaves(tree))
    )


def quartile_metrics(name: str, t: jnp.ndarray, values: jnp.ndarray, num_timesteps: int):
    """Per-timestep-quartile loss logging
    (parity: log_loss_dict, multimodal_train_util.py:542-549)."""
    out = {}
    quartile = (4 * t) // num_timesteps
    for q in range(4):
        mask = (quartile == q).astype(jnp.float32)
        out[f"{name}_q{q}"] = jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    return out


def multimodal_adapter(model):
    """Default batch adapter: joint AV batches for the coupled MM-UNet."""

    def adapt(params, micro, rngs):
        def model_fn(x, t_model):
            v, a = model.apply(
                {"params": params}, x["video"], x["audio"], t_model, train=True,
                rngs=rngs,
            )
            return {"video": v, "audio": a}

        return micro, model_fn

    return adapt


def make_train_step(
    model,
    diffusion: GaussianDiffusion,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
    train_rngs: Tuple[str, ...] = ("shift", "dropout"),
    adapter=None,
):
    """Build the pure train step ``(state, batch, rng) -> (state, metrics)``.

    ``batch`` is the *global* batch pytree (default: ``{"video": [B,F,H,W,C],
    "audio": [B,L,C]}``); under a mesh the caller shards its leading axis over
    the data axis and jit inserts the gradient psum.  With ``accum_steps > 1``
    the batch is split into microbatches scanned sequentially (the reference's
    no_sync() microbatching, multimodal_train_util.py:289-319).

    ``adapter(params, micro, rngs) -> (x_start, model_fn)`` maps a microbatch
    to the diffusion target pytree and the bound model function — this is how
    the one step function serves the coupled model, the image-SR model
    (``low_res`` conditioning), and the single-modal video/audio models
    (replacing the reference's per-task TrainLoop duplication,
    train_util.py:34 vs multimodal_train_util.py:25).
    """
    if adapter is None:
        adapter = multimodal_adapter(model)

    def loss_for_batch(params, micro, t, weights, rng):
        k_loss, k_shift, k_drop = jax.random.split(rng, 3)
        rngs = {}
        if "shift" in train_rngs:
            rngs["shift"] = k_shift
        if "dropout" in train_rngs:
            rngs["dropout"] = k_drop
        x_start, model_fn = adapter(params, micro, rngs)
        terms = diffusion.training_losses(model_fn, x_start, t, k_loss)
        loss = jnp.mean(terms["loss"] * weights)
        return loss, terms

    def train_step(state: TrainState, batch: PyTree, rng: jax.Array):
        b = jax.tree_util.tree_leaves(batch)[0].shape[0]
        rng_t, rng_loss = jax.random.split(jax.random.fold_in(rng, state.step))
        t, weights = state.sampler.sample(rng_t, b)

        if accum_steps == 1:
            (loss, terms), grads = jax.value_and_grad(loss_for_batch, has_aux=True)(
                state.params, batch, t, weights, rng_loss
            )
            flat_loss = terms["loss"]
        else:
            assert b % accum_steps == 0
            micro_b = b // accum_steps

            def micro_slice(tree, i):
                return jax.tree.map(
                    lambda l: jax.lax.dynamic_slice_in_dim(l, i * micro_b, micro_b, 0), tree
                )

            def body(carry, i):
                g_acc, loss_acc = carry
                mb = micro_slice(batch, i)
                mt = jax.lax.dynamic_slice_in_dim(t, i * micro_b, micro_b, 0)
                mw = jax.lax.dynamic_slice_in_dim(weights, i * micro_b, micro_b, 0)
                (loss, terms), grads = jax.value_and_grad(loss_for_batch, has_aux=True)(
                    state.params, mb, mt, mw, jax.random.fold_in(rng_loss, i)
                )
                g_acc = jax.tree.map(lambda a_, g_: a_ + g_, g_acc, grads)
                loss_acc = jax.lax.dynamic_update_slice_in_dim(
                    loss_acc, terms["loss"], i * micro_b, 0
                )
                return (g_acc, loss_acc), loss

            g0 = jax.tree.map(jnp.zeros_like, state.params)
            (grads, flat_loss), losses = jax.lax.scan(
                body, (g0, jnp.zeros((b,), jnp.float32)), jnp.arange(accum_steps)
            )
            grads = jax.tree.map(lambda g_: g_ / accum_steps, grads)
            loss = jnp.mean(losses)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        new_ema = {
            rate_str: jax.tree.map(
                lambda e, p, r=float(rate_str): e * r + p * (1.0 - r),
                ema_tree,
                new_params,
            )
            for rate_str, ema_tree in state.ema.items()
        }
        new_sampler = state.sampler.update(t, flat_loss)

        metrics = {
            "loss": loss,
            "grad_norm": _global_norm(grads),
            "param_norm": _global_norm(new_params),
            "lr_step": state.step.astype(jnp.float32),
        }
        metrics.update(quartile_metrics("loss", t, flat_loss, diffusion.num_timesteps))

        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema=new_ema,
            sampler=new_sampler,
        )
        return new_state, metrics

    return train_step
