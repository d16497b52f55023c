"""Noise schedules, schedule coefficient tables, and timestep respacing.

TPU-native re-design of the reference schedule machinery
(`mm_diffusion/multimodal_gaussian_diffusion.py:17-61,131-168` and
`mm_diffusion/multimodal_respace.py:6-125`):

* All coefficient tables are computed once on the host in float64 numpy
  (matching the reference's precision discipline) and then frozen into a
  single immutable :class:`ScheduleTables` pytree of float32 device arrays.
* Timestep respacing (the reference's ``SpacedDiffusion`` subclass + its
  ``_WrappedModel`` indirection) collapses to a precomputed ``timestep_map``
  gather: samplers index model timesteps through a static int32 array instead
  of wrapping the model object.  Under ``jit`` this is a free gather.
"""

from __future__ import annotations

import math
from typing import Sequence, Set, Union

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "get_named_beta_schedule",
    "betas_for_alpha_bar",
    "space_timesteps",
    "respace_betas",
    "ScheduleTables",
    "make_schedule",
]


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Pre-defined beta schedules (parity: multimodal_gaussian_diffusion.py:17-41)."""
    if schedule_name == "linear":
        # Ho et al. linear schedule, rescaled so behaviour is invariant to T.
        scale = 1000.0 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "cosine":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (parity: multimodal_gaussian_diffusion.py:44-61)."""
    ts = np.arange(num_diffusion_timesteps, dtype=np.float64)
    t1 = ts / num_diffusion_timesteps
    t2 = (ts + 1.0) / num_diffusion_timesteps
    a1 = np.array([alpha_bar(float(t)) for t in t1])
    a2 = np.array([alpha_bar(float(t)) for t in t2])
    return np.minimum(1.0 - a2 / a1, max_beta)


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """Choose the subset of original timesteps to keep when re-spacing.

    Semantics match the reference exactly (multimodal_respace.py:6-59),
    including the "ddimN" fixed-stride special case and the per-section
    fractional striding; the returned set feeds :func:`respace_betas`.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for stride in range(1, num_timesteps):
                if len(range(0, num_timesteps, stride)) == desired_count:
                    return set(range(0, num_timesteps, stride))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]

    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        frac_stride = 1 if section_count <= 1 else (size - 1) / (section_count - 1)
        cur = 0.0
        for _ in range(section_count):
            all_steps.append(start_idx + round(cur))
            cur += frac_stride
        start_idx += size
    return set(all_steps)


def respace_betas(betas: np.ndarray, use_timesteps: Set[int]):
    """Recompute betas over the kept timesteps.

    Returns ``(new_betas, timestep_map)`` where ``timestep_map[i]`` is the
    original timestep index of respaced step ``i``
    (parity: multimodal_respace.py:71-86).
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas_cumprod = np.cumprod(1.0 - betas)
    last = 1.0
    new_betas, timestep_map = [], []
    for i, ac in enumerate(alphas_cumprod):
        if i in use_timesteps:
            new_betas.append(1.0 - ac / last)
            last = ac
            timestep_map.append(i)
    return np.array(new_betas, dtype=np.float64), np.array(timestep_map, dtype=np.int64)


class ScheduleTables(struct.PyTreeNode):
    """Immutable coefficient tables for a (possibly respaced) diffusion process.

    Mirrors every table precomputed by the reference constructor
    (multimodal_gaussian_diffusion.py:131-168) plus the respacing map.
    All arrays have shape ``[num_timesteps]`` (float32 on device; computed in
    float64 on host).
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    log_betas: jnp.ndarray
    # FIXED_LARGE variance table: append(posterior_variance[1], betas[1:])
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # Respacing: model timestep = timestep_map[sampler timestep].
    timestep_map: jnp.ndarray
    # Static metadata.
    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)

    @property
    def is_respaced(self) -> bool:
        return self.num_timesteps != self.original_num_steps

    def map_timesteps(self, t: jnp.ndarray) -> jnp.ndarray:
        """Map sampler-step indices to original model timesteps (the
        reference's _WrappedModel gather, multimodal_respace.py:134-139)."""
        return self.timestep_map[t]


def make_schedule(
    noise_schedule: str = "linear",
    diffusion_steps: int = 1000,
    timestep_respacing: Union[str, Sequence[int], None] = None,
    dtype=jnp.float32,
) -> ScheduleTables:
    """Build :class:`ScheduleTables` for a named schedule with optional respacing."""
    base_betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if timestep_respacing:
        kept = space_timesteps(diffusion_steps, timestep_respacing)
        betas, timestep_map = respace_betas(base_betas, kept)
    else:
        betas = base_betas
        timestep_map = np.arange(diffusion_steps, dtype=np.int64)
    return tables_from_betas(
        betas, timestep_map=timestep_map, original_num_steps=diffusion_steps, dtype=dtype
    )


def tables_from_betas(
    betas: np.ndarray,
    timestep_map: np.ndarray = None,
    original_num_steps: int = None,
    dtype=jnp.float32,
) -> ScheduleTables:
    """Compute all coefficient tables from a 1-D beta array (float64 host math)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    n = betas.shape[0]
    if timestep_map is None:
        timestep_map = np.arange(n, dtype=np.int64)
    if original_num_steps is None:
        original_num_steps = n

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return ScheduleTables(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        alphas_cumprod_next=as_dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=as_dev(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        log_betas=as_dev(np.log(betas)),
        fixed_large_variance=as_dev(fixed_large_variance),
        fixed_large_log_variance=as_dev(np.log(fixed_large_variance)),
        timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
        num_timesteps=int(n),
        original_num_steps=int(original_num_steps),
    )
