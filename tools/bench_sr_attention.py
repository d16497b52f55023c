"""Isolated timing of the image-UNet spatial self-attention at the SR
flagship's hot shapes (N=16 frames; T = 32^2/16^2/8^2 tokens), Pallas block
kernel vs the einsum reference — drives the dispatch threshold decision.

Usage: python tools/bench_sr_attention.py
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from mm_diffusion_tpu.ops import block_attention as ba


def timeit(fn, x0, n_chain=30, n_outer=2):
    def chained(x):
        def body(c, _):
            y = fn(c)
            # keep carry shape [N, T, 3C]: fold the [N, T, C] output back in
            c = c.at[..., : y.shape[-1]].add(0.1 * y.astype(c.dtype))
            return c * 0.97, ()

        c, _ = jax.lax.scan(body, x, None, length=n_chain)
        return jnp.mean(c)

    g = jax.jit(chained)
    _ = jax.device_get(g(x0))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(g(x0))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1000


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    # (N, T, C, heads): SR 64->256 config, attention_resolutions 32,16,8
    cases = [
        (16, 32 * 32, 384, 6),
        (16, 16 * 16, 768, 12),
        (16, 8 * 8, 768, 12),
    ]
    for n, t, c, h in cases:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c), jnp.bfloat16)
        fits = ba.self_attention_fits(n, t, c, h)
        ms_ref = timeit(lambda x: ba.self_attention_reference(x, h), qkv)
        line = f"N={n} T={t:5d} C={c} H={h:2d} fits={fits}  einsum {ms_ref:7.3f} ms"
        if jax.default_backend() == "tpu" and fits:
            ms_pl = timeit(lambda x: ba.self_attention_packed(x, h), qkv)
            line += f"  pallas {ms_pl:7.3f} ms  ratio {ms_pl / ms_ref:.2f}"
        print(line)


if __name__ == "__main__":
    main()
