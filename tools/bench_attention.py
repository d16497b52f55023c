"""Isolated timing of the MM-UNet attention blocks at their hot shapes,
flash kernel vs einsum path (chained-scan protocol).

Usage: python tools/bench_attention.py
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


def timeit(block_apply, x0, n_chain=30, n_outer=2):
    def chained(x):
        def body(c, _):
            y = block_apply(c)
            blended = jax.tree.map(
                lambda a, b: (0.7 * a + 0.3 * b).astype(a.dtype), c, y
            )
            return blended, ()

        c, _ = jax.lax.scan(body, x, None, length=n_chain)
        return sum(jnp.mean(l) for l in jax.tree_util.tree_leaves(c))

    g = jax.jit(chained)
    _ = jax.device_get(g(x0))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(g(x0))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1000


def main():
    import mm_diffusion_tpu.ops.fused_attention as fa
    from mm_diffusion_tpu.models.attention import (
        FactorizedVideoAttention,
        RSMMACrossAttention,
    )

    B, F = 8, 16
    print("backend:", jax.default_backend())

    cases = []
    # (name, ds, hw_side, C, audio_len, lw)
    for ds, c, lw in [(2, 256, 1), (4, 384, 4), (8, 512, 8)]:
        side = 64 // ds
        cases.append((ds, side, c, 25600 // ds // ds, lw))

    for ds, side, c, al, lw in cases:
        video = jax.random.normal(
            jax.random.PRNGKey(0), (B, F, side, side, c), jnp.bfloat16
        )
        audio = jax.random.normal(jax.random.PRNGKey(1), (B, al, c), jnp.bfloat16)

        fv = FactorizedVideoAttention(c, 4)
        pv = fv.init(jax.random.PRNGKey(2), video)
        rs = RSMMACrossAttention(c, c // 64, lw, window_shift=False)
        pr = rs.init({"params": jax.random.PRNGKey(3)}, video, audio)

        for flash in (True, False):
            orig = fa._use_flash
            if not flash:
                fa._use_flash = lambda *a: False
            try:
                t_v = timeit(lambda v: fv.apply(pv, v), video)
                t_x = timeit(
                    lambda vv: tuple(rs.apply(pr, vv[0], vv[1])), (video, audio)
                )
            finally:
                fa._use_flash = orig
            label = "flash " if flash else "einsum"
            print(
                f"ds{ds} C={c} hw={side*side} al={al} lw={lw} [{label}]  "
                f"video_attn {t_v:7.3f} ms   rsmma {t_x:7.3f} ms"
            )


if __name__ == "__main__":
    main()
