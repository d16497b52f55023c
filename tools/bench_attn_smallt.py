"""Diagnose the small-T attention floor at the SR flagship shapes.

Each SR attention site costs ~0.8 ms on chip even when the math is ~5 us
(T=64).  Suspects: (a) lane-UNALIGNED per-head slicing in the Pallas kernel
(d=64 head blocks sit at 64-lane offsets inside the [RT, 3C] VMEM buffer —
every q/k/v extraction is a VPU lane-shuffle copy), (b) batched-matmul
serialization in the einsum path.  This times the same (N, T, C) workload
with D=64 (unaligned) vs D=128 (aligned) heads, plus the einsum oracle,
to separate alignment cost from everything else.

Usage: python tools/bench_attn_smallt.py
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
    cases = [
        # (N, T, C, H) pairs: same C twice, D=64 (stock) vs D=128 (aligned)
        (16, 64, 768, 12),
        (16, 64, 768, 6),
        (16, 256, 768, 12),
        (16, 256, 768, 6),
        (16, 1024, 384, 6),
        (16, 1024, 384, 3),
    ]
    for n, t, c, h in cases:
        d = c // h
        qkv = jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c), jnp.bfloat16)
        ms_pl = timeit(lambda x: ba.self_attention_packed(x, h), qkv)
        ms_ref = timeit(lambda x: ba.self_attention_reference(x, h), qkv)
        print(
            f"N={n} T={t:5d} C={c} H={h:2d} D={d:3d}  "
            f"pallas {ms_pl:7.3f} ms  einsum {ms_ref:7.3f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
