"""Timestep schedule samplers for training.

Re-design of `mm_diffusion/resample.py`: the reference keeps per-timestep
loss history in Python objects and `all_gather`s local losses across ranks
(:71-104).  Here the sampler state is a pytree carried inside the train state
and updated *inside* the pjit'd step — the "all_gather" is implicit because
the step already sees the global (sharded) batch.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


class UniformSampler(struct.PyTreeNode):
    """Uniform timestep sampling with unit importance weights
    (parity: resample.py UniformSampler)."""

    num_timesteps: int = struct.field(pytree_node=False)

    def sample(self, rng: jax.Array, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = jax.random.randint(rng, (batch,), 0, self.num_timesteps)
        return t, jnp.ones((batch,), jnp.float32)

    def update(self, t, losses):
        return self


class LossSecondMomentResampler(struct.PyTreeNode):
    """Importance-sample timesteps by the RMS of recent losses
    (parity: LossSecondMomentResampler, resample.py:124-154).

    Keeps the last ``history`` losses per timestep in a ring buffer; until the
    buffer is warm, sampling stays uniform.  Weights are
    sqrt(E[loss^2]) per timestep, smoothed with ``uniform_prob``.
    """

    loss_history: jnp.ndarray  # [T, history]
    loss_counts: jnp.ndarray  # [T] int32
    num_timesteps: int = struct.field(pytree_node=False)
    history: int = struct.field(pytree_node=False, default=10)
    uniform_prob: float = struct.field(pytree_node=False, default=0.001)

    @classmethod
    def create(cls, num_timesteps: int, history: int = 10, uniform_prob: float = 0.001):
        return cls(
            loss_history=jnp.zeros((num_timesteps, history), jnp.float32),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
            num_timesteps=num_timesteps,
            history=history,
            uniform_prob=uniform_prob,
        )

    def _warmed_up(self):
        return jnp.all(self.loss_counts == self.history)

    def weights(self) -> jnp.ndarray:
        w = jnp.sqrt(jnp.mean(self.loss_history**2, axis=-1))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.full((self.num_timesteps,), 1.0 / self.num_timesteps)
        return jnp.where(self._warmed_up(), w, uniform)

    def sample(self, rng: jax.Array, batch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        w = self.weights()
        t = jax.random.choice(rng, self.num_timesteps, (batch,), p=w)
        weights = 1.0 / (self.num_timesteps * w[t])
        return t, weights

    def update(self, t: jnp.ndarray, losses: jnp.ndarray) -> "LossSecondMomentResampler":
        """Insert the batch's (t, loss) pairs into the per-timestep ring
        buffers (parity: update_with_all_losses, resample.py:136-154, which
        shifts the history left when full)."""

        def insert_one(carry, pair):
            hist, counts = carry
            ti, li = pair
            cnt = counts[ti]
            # when full: shift left and append; else write at cnt
            row = hist[ti]
            shifted = jnp.concatenate([row[1:], jnp.array([li])])
            grown = row.at[jnp.minimum(cnt, self.history - 1)].set(li)
            new_row = jnp.where(cnt == self.history, shifted, grown)
            hist = hist.at[ti].set(new_row)
            counts = counts.at[ti].set(jnp.minimum(cnt + 1, self.history))
            return (hist, counts), None

        (hist, counts), _ = jax.lax.scan(
            insert_one, (self.loss_history, self.loss_counts), (t, losses)
        )
        return self.replace(loss_history=hist, loss_counts=counts)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """(parity: create_named_schedule_sampler, resample.py:8-21)"""
    if name == "uniform":
        return UniformSampler(num_timesteps=num_timesteps)
    if name == "loss-second-moment":
        return LossSecondMomentResampler.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")
