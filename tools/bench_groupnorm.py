"""Microbench: flax fp32-cast GroupNorm vs channel-sum rewrite on hot shapes.

The profile (tools/profile_models.py) shows GN stats (`convert_reduce_fusion`)
at 58% of the SR model's device time.  Hypothesis: casting x to fp32 before
nn.GroupNorm materializes the fp32 tensor and the [.., G, C/G] reshape makes
the group reduce lane-crossing.  The rewrite reduces over spatial only
(per-channel, lane-parallel, convert fused into the reduce) and finishes the
group math on tiny [B, G] tensors.
"""

from __future__ import annotations

import functools
import os
import time

import jax

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

import jax.numpy as jnp
from flax import linen as nn


def flax_gn(x, gamma, beta, groups):
    b = x.shape[0]
    c = x.shape[-1]
    xr = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = xr.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xr).mean(axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xr - mean) * jax.lax.rsqrt(var + 1e-5)
    y = y.reshape(x.shape) * gamma + beta
    return nn.silu(y).astype(x.dtype)


def fast_gn(x, gamma, beta, groups):
    b = x.shape[0]
    c = x.shape[-1]
    red = tuple(range(1, x.ndim - 1))
    n = functools.reduce(lambda a, d: a * d, [x.shape[i] for i in red], 1) * (c // groups)
    xf = x.astype(jnp.float32)
    csum = jnp.sum(xf, axis=red)  # [B, C], convert fused into reduce
    csumsq = jnp.sum(jnp.square(xf), axis=red)  # second bf16 read
    gsum = csum.reshape(b, groups, -1).sum(-1)  # tiny
    gsumsq = csumsq.reshape(b, groups, -1).sum(-1)
    mean = gsum / n
    var = gsumsq / n - jnp.square(mean)
    rstd = jax.lax.rsqrt(var + 1e-5)
    shape = (b,) + (1,) * (x.ndim - 2) + (c,)
    mean_c = jnp.repeat(mean, c // groups, axis=-1).reshape(shape)
    rstd_c = jnp.repeat(rstd, c // groups, axis=-1).reshape(shape)
    # y = (x - mean) * rstd * gamma + beta == x * cs + cb
    cs = (rstd_c * gamma).astype(x.dtype)
    cb = (beta - mean_c * rstd_c * gamma).astype(x.dtype)
    y = x * cs + cb
    return nn.silu(y)


def timeit(f, x, gamma, beta, groups, n_chain=40, n_outer=2):
    """Serial scan-chained timing (python-loop timing under-reports through
    the async remote-device transport — same protocol as bench.py)."""

    def chained(x0):
        def body(c, _):
            y = f(c, gamma, beta, groups)
            return (0.5 * c + 0.5 * y).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, x0, None, length=n_chain)
        return jnp.mean(c)

    g = jax.jit(chained)
    _ = jax.device_get(g(x))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(g(x))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1000


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for shape, groups in [
        ((16, 256, 256, 192), 32),
        ((16, 128, 128, 384), 32),
        ((16, 64, 64, 768), 32),
        ((8, 16, 64, 64, 128), 32),
        ((8, 16, 32, 32, 256), 32),
        ((8 * 16, 1024, 256), 32),
        ((8, 25600, 128), 32),
    ]:
        c = shape[-1]
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16) * 3 + 1.3
        gamma = jnp.linspace(0.5, 1.5, c, dtype=jnp.float32)
        beta = jnp.linspace(-0.2, 0.2, c, dtype=jnp.float32)
        t_flax = timeit(flax_gn, x, gamma, beta, groups)
        t_fast = timeit(fast_gn, x, gamma, beta, groups)
        a = jax.jit(flax_gn, static_argnums=3)(x, gamma, beta, groups)
        b = jax.jit(fast_gn, static_argnums=3)(x, gamma, beta, groups)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        gb = x.size * 2 / 1e9
        print(
            f"{str(shape):>24} flax {t_flax:7.3f} ms | fast {t_fast:7.3f} ms "
            f"({t_flax/t_fast:4.1f}x)  maxerr {err:.4f}  ideal(3 passes) "
            f"{3*gb/0.819:6.3f} ms"
        )
