"""Microbench + profile of one ImageResBlock at the SR model's hot shape.

Reproduces the full-model pathology (10 ms `convert_reduce_fusion` per GN at
[16,256,256,192] where standalone GN costs 1.3 ms) in an iterable harness.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import jax

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

from mm_diffusion_tpu.models.image_unet import ImageResBlock, ImageUNetConfig  # noqa: E402


def main():
    B, H, W, C = 16, 256, 256, 192
    cfg = ImageUNetConfig(
        image_size=256, model_channels=192, use_scale_shift_norm=True,
        resblock_updown=True, dtype="bfloat16",
    )
    block = ImageResBlock(C, C, cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, 4 * 192), jnp.bfloat16)
    params = block.init(jax.random.PRNGKey(2), x, emb)

    def one(c):
        y = block.apply(params, c, emb)
        return (0.7 * c + 0.3 * y).astype(c.dtype)

    n_chain = 20

    def chained(x0):
        def body(c, _):
            return one(c), ()

        c, _ = jax.lax.scan(body, x0, None, length=n_chain)
        return jnp.mean(c)

    g = jax.jit(chained)
    _ = jax.device_get(g(x))
    t0 = time.perf_counter()
    for _ in range(2):
        _ = jax.device_get(g(x))
    per = (time.perf_counter() - t0) / (2 * n_chain) * 1000
    print(f"ImageResBlock [{B},{H},{W},{C}]: {per:.3f} ms/block")

    tmp = tempfile.mkdtemp(prefix="trace_resblock_")
    jax.profiler.start_trace(tmp)
    _ = jax.device_get(g(x))
    jax.profiler.stop_trace()
    from tools.profile_models import top_ops

    print("top ops (per chain-step):")
    for name, ms, n in top_ops(tmp, top_n=20):
        print(f"{ms/n_chain:9.3f} ms  x{n:5d}  {name[:110]}")


if __name__ == "__main__":
    main()
