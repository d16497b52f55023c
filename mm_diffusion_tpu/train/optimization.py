"""BertAdam optimizer + warmup schedules as optax transforms.

Parity with the reference's vendored ``mm_diffusion/optimization.py`` (the
BERT variant of Adam: NO bias correction, per-tensor gradient-norm clipping,
decoupled weight decay added to the update, and the warmup schedule applied
inside the step — ``optimization.py:52-169``).  The reference's shipped
training scripts construct AdamW instead (``multimodal_train_util.py:107``),
so this exists for API completeness: anyone porting a config that used
BertAdam gets the same update rule as a standard optax
``GradientTransformation``.

Semantics mirrored exactly (file:line into the reference):

* warmup schedules ``warmup_cosine/constant/linear`` (``optimization.py:26-48``)
  evaluated at ``progress = step / t_total``; ``t_total == -1`` means a
  constant learning rate.
* per-parameter-tensor grad clipping to ``max_grad_norm``
  (``optimization.py:137-138`` — note the reference clips each tensor
  separately, not the global norm).
* moment updates WITHOUT bias correction (``optimization.py:142-146``).
* decoupled weight decay added to the normalized update, not the gradient
  (``optimization.py:148-156``).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def warmup_cosine(x, warmup=0.002):
    """(parity: optimization.py:26-29)"""
    return jnp.where(x < warmup, x / warmup, 0.5 * (1.0 + jnp.cos(math.pi * x)))


def warmup_constant(x, warmup=0.002):
    """(parity: optimization.py:31-36)"""
    return jnp.where(x < warmup, x / warmup, 1.0)


def warmup_linear(x, warmup=0.002):
    """(parity: optimization.py:38-43)"""
    return jnp.where(
        x < warmup, x / warmup, jnp.maximum((x - 1.0) / (warmup - 1.0), 0.0)
    )


SCHEDULES = {
    "warmup_cosine": warmup_cosine,
    "warmup_constant": warmup_constant,
    "warmup_linear": warmup_linear,
}


class BertAdamState(NamedTuple):
    step: jnp.ndarray  # int32 scalar
    m: optax.Params
    v: optax.Params


def bert_adam(
    lr: float,
    warmup: float = -1,
    t_total: int = -1,
    schedule: str = "warmup_linear",
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
    weight_decay: float = 0.01,
    max_grad_norm: float = 1.0,
) -> optax.GradientTransformation:
    """BERT-Adam as an optax ``GradientTransformation``.

    One jitted tree pass; moments are stored in the parameter dtype (fp32
    master params in this framework's TrainState).
    """
    if schedule not in SCHEDULES:
        raise ValueError(f"Invalid schedule parameter: {schedule}")
    if not (warmup == -1 or 0.0 <= warmup < 1.0):
        raise ValueError(f"Invalid warmup: {warmup}")
    for name, val, lo, hi in (("b1", b1, 0.0, 1.0), ("b2", b2, 0.0, 1.0)):
        if not lo <= val < hi:
            raise ValueError(f"Invalid {name} parameter: {val}")
    if eps < 0.0 or lr < 0.0:
        raise ValueError(f"Invalid lr/epsilon: {lr}, {eps}")
    schedule_fct = SCHEDULES[schedule]

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return BertAdamState(step=jnp.zeros((), jnp.int32), m=zeros, v=zeros)

    def update_fn(grads, state, params):
        assert params is not None, "bert_adam requires params (weight decay)"

        if max_grad_norm > 0:
            # per-TENSOR clipping, exactly like the reference's per-param
            # clip_grad_norm_ call (optimization.py:137-138)
            def clip_leaf(g):
                norm = jnp.sqrt(jnp.sum(jnp.square(g.astype(jnp.float32))))
                scale = jnp.minimum(1.0, max_grad_norm / jnp.maximum(norm, 1e-6))
                return (g * scale).astype(g.dtype)

            grads = jax.tree.map(clip_leaf, grads)

        if t_total != -1:
            progress = state.step.astype(jnp.float32) / t_total
            lr_t = lr * schedule_fct(progress, warmup)
        else:
            lr_t = jnp.asarray(lr, jnp.float32)

        m = jax.tree.map(lambda mm, g: b1 * mm + (1 - b1) * g, state.m, grads)
        v = jax.tree.map(lambda vv, g: b2 * vv + (1 - b2) * g * g, state.v, grads)

        def leaf_update(mm, vv, p):
            upd = mm / (jnp.sqrt(vv) + eps)
            if weight_decay > 0.0:
                upd = upd + weight_decay * p
            return (-lr_t * upd).astype(p.dtype)

        updates = jax.tree.map(leaf_update, m, v, params)
        return updates, BertAdamState(step=state.step + 1, m=m, v=v)

    return optax.GradientTransformation(init_fn, update_fn)
