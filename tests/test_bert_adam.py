"""BertAdam parity: the optax transform must reproduce the reference's
update rule (mm_diffusion/optimization.py:52-169 — no bias correction,
per-tensor clipping, decoupled weight decay, in-step warmup schedule),
verified against an independent numpy step-by-step simulation."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mm_diffusion_tpu.train import bert_adam
from mm_diffusion_tpu.train.optimization import (
    warmup_constant,
    warmup_cosine,
    warmup_linear,
)


def _np_bert_adam_steps(params, grads_seq, *, lr, warmup, t_total, schedule,
                        b1=0.9, b2=0.999, eps=1e-6, wd=0.01, max_norm=1.0):
    """Independent simulation of the reference step (optimization.py:105-168)."""
    sched = {
        "warmup_cosine": lambda x, w: x / w if x < w else 0.5 * (1 + math.cos(math.pi * x)),
        "warmup_constant": lambda x, w: x / w if x < w else 1.0,
        "warmup_linear": lambda x, w: x / w if x < w else max((x - 1.0) / (w - 1.0), 0.0),
    }[schedule]
    p = {k: v.astype(np.float64) for k, v in params.items()}
    m = {k: np.zeros_like(v) for k, v in p.items()}
    v_ = {k: np.zeros_like(v) for k, v in p.items()}
    step = 0
    for grads in grads_seq:
        for k in p:
            g = grads[k].astype(np.float64)
            if max_norm > 0:
                norm = np.sqrt((g**2).sum())
                if norm > max_norm:
                    g = g * (max_norm / max(norm, 1e-6))
            m[k] = b1 * m[k] + (1 - b1) * g
            v_[k] = b2 * v_[k] + (1 - b2) * g * g
            upd = m[k] / (np.sqrt(v_[k]) + eps)
            if wd > 0:
                upd = upd + wd * p[k]
            lr_t = lr * sched(step / t_total, warmup) if t_total != -1 else lr
            p[k] = p[k] - lr_t * upd
        step += 1
    return p


@pytest.mark.parametrize("schedule", ["warmup_linear", "warmup_cosine", "warmup_constant"])
def test_bert_adam_matches_reference_simulation(schedule):
    rng = np.random.RandomState(0)
    params = {
        "w": rng.randn(4, 3).astype(np.float32),
        "b": rng.randn(3).astype(np.float32) * 0.1,
    }
    grads_seq = [
        {"w": rng.randn(4, 3).astype(np.float32) * s, "b": rng.randn(3).astype(np.float32) * s}
        for s in (0.5, 3.0, 1.0)  # step 2 exercises the per-tensor clip
    ]
    kw = dict(lr=1e-2, warmup=0.4, t_total=5, schedule=schedule)

    tx = bert_adam(**kw)
    jp = jax.tree.map(jnp.asarray, params)
    state = tx.init(jp)
    for g in grads_seq:
        updates, state = tx.update(jax.tree.map(jnp.asarray, g), state, jp)
        jp = optax.apply_updates(jp, updates)

    ref = _np_bert_adam_steps(params, grads_seq, max_norm=1.0, **kw)
    for k in params:
        np.testing.assert_allclose(np.asarray(jp[k]), ref[k], rtol=1e-5, atol=1e-6)


def test_bert_adam_constant_lr_when_t_total_unset():
    params = {"w": jnp.ones((2, 2))}
    tx = bert_adam(lr=1e-3, t_total=-1)
    state = tx.init(params)
    g = {"w": jnp.full((2, 2), 0.5)}
    updates, state = tx.update(g, state, params)
    # no schedule, wd 0.01 default: update = -lr * (m/(sqrt(v)+eps) + wd*p)
    assert float(jnp.max(jnp.abs(updates["w"]))) > 0
    assert int(state.step) == 1


def test_warmup_schedules_shapes():
    xs = jnp.linspace(0.0, 1.0, 11)
    for f in (warmup_cosine, warmup_constant, warmup_linear):
        ys = jax.vmap(lambda x: f(x, 0.1))(xs)
        assert ys.shape == xs.shape
        assert float(ys[0]) == 0.0  # x=0 -> 0 in warmup region
    # linear decays to 0 at x=1, constant stays 1, cosine hits cos(pi)=0
    assert float(warmup_linear(1.0, 0.1)) == 0.0
    assert float(warmup_constant(1.0, 0.1)) == 1.0
    assert abs(float(warmup_cosine(1.0, 0.1))) < 1e-6


def test_bert_adam_trains_in_train_step():
    """bert_adam drops into create_train_state/make_train_step unchanged."""
    from mm_diffusion_tpu.train import create_train_state

    tx = bert_adam(lr=1e-3, warmup=0.1, t_total=100)
    params = {"w": jnp.ones((3,), jnp.float32)}
    state = create_train_state(params, tx, ema_rates=(0.9,))

    def loss_fn(p):
        return jnp.sum(jnp.square(p["w"] - 2.0))

    # step 0 has lr == 0 under warmup (progress 0 -> schedule 0, faithful to
    # the reference); loss must decrease once the warmup ramp is underway.
    params_t, opt_state = state.params, state.opt_state
    for _ in range(3):
        g = jax.grad(loss_fn)(params_t)
        updates, opt_state = tx.update(g, opt_state, params_t)
        params_t = optax.apply_updates(params_t, updates)
    assert float(loss_fn(params_t)) < float(loss_fn(state.params))
