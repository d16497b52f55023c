"""Spike: depth-to-space + skip-pool alternatives at the SR hot shapes.

1) subpixel_interleave [16,128,128,768] -> [16,256,256,192]: the XLA
   transpose path profiles at 1.2 (pre-copy) + 1.445 (transpose) ms in-model
   vs a ~1.0 ms read+write floor.  Candidates: current XLA transpose, a
   Pallas row-pair writer, and a lane-shuffle-free variant that emits the
   output as [B, 2H, W, 2, C] (consumer reshapes for free? no — check).

2) skip 2x2 avg-pool + add [16,256,256,192]: split-pixel mean profiles at
   1.9 ms vs reduce_window-fused 0.956 for the h path.  Candidates: current
   mean, bf16 avg_pool (no f32 convert), f32-convert avg_pool.
"""
import functools
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from flax import linen as nn

B, H, W, CO = 16, 128, 128, 192
C4 = 4 * CO


def time_chain(f, *args, n=20, outer=3):
    # chain via dependency on a scalar probe so XLA can't hoist
    def chained(*a):
        def body(c, _):
            o = f(*a)
            return c + jnp.sum(o[..., :1].astype(jnp.float32)) * 1e-12, ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return c
    cc = jax.jit(chained)
    _ = jax.device_get(cc(*args))
    t0 = time.perf_counter()
    for _ in range(outer):
        _ = jax.device_get(cc(*args))
    return (time.perf_counter() - t0) / (outer * n) * 1000


y = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C4), jnp.bfloat16)


def d2s_xla(y):
    out = y.reshape(B, H, W, 2, 2, CO)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * H, 2 * W, CO)


def d2s_v3(y):
    # single transpose whose moving minor unit is a contiguous [2*CO] block:
    # [B,H,W,2,2CO] -> swap (W, row-phase) -> [B,H,2,W,2CO]; every other
    # reshape is layout-free.  Same math as d2s_xla (phase-major blocks).
    z = y.reshape(B, H, W, 2, 2 * CO)
    z = z.transpose(0, 1, 3, 2, 4)
    return z.reshape(B, 2 * H, 2 * W, CO)


def d2s_rowcat(y):
    # row-phase split + per-phase W-interleave via stack at XLA level
    z = y.reshape(B, H, W, 2, 2, CO)
    r0 = z[:, :, :, 0].reshape(B, H, 2 * W, CO)
    r1 = z[:, :, :, 1].reshape(B, H, 2 * W, CO)
    return jnp.stack([r0, r1], axis=2).reshape(B, 2 * H, 2 * W, CO)


x = jax.random.normal(jax.random.PRNGKey(1), (16, 256, 256, 192), jnp.bfloat16)
h2 = jax.random.normal(jax.random.PRNGKey(2), (16, 128, 128, 192), jnp.bfloat16)


def pool_mean(x, h2):
    s5 = x.reshape(16, 128, 2, 128, 2, 192)
    return s5.mean(axis=(2, 4)).astype(h2.dtype) + h2


def pool_avg_bf16(x, h2):
    return nn.avg_pool(x, (2, 2), (2, 2)) + h2


def pool_avg_f32(x, h2):
    y = nn.avg_pool(x.astype(jnp.float32), (2, 2), (2, 2))
    return y.astype(h2.dtype) + h2


ref = jax.jit(d2s_xla)(y)
print("d2s v3 parity:", bool(jnp.array_equal(ref, jax.jit(d2s_v3)(y))))
print("d2s rowcat parity:", bool(jnp.array_equal(ref, jax.jit(d2s_rowcat)(y))))

print(f"d2s xla:    {time_chain(d2s_xla, y):.3f} ms")
print(f"d2s v3:     {time_chain(d2s_v3, y):.3f} ms")
print(f"d2s rowcat: {time_chain(d2s_rowcat, y):.3f} ms")
print(f"pool mean:      {time_chain(pool_mean, x, h2):.3f} ms")
print(f"pool avg bf16:  {time_chain(pool_avg_bf16, x, h2):.3f} ms")
print(f"pool avg f32:   {time_chain(pool_avg_f32, x, h2):.3f} ms")
