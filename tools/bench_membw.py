"""Raw HBM bandwidth probe at the SR activation shapes: is the 1.9 ms
down-pool a strided-reduce artifact or just this chip's elementwise floor?

Times y = 2*x (read+write) at [16,256,256,C] bf16 for C in {192, 256, 128}
and reports achieved GB/s; also the pool+add at C=256 to see whether the
lane pad (192 -> 1.5 tiles) is what caps the pool.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

B, H, W = 16, 256, 256


def time_chain(f, x, h=None, n=20, outer=3):
    def chained(x, c0):
        def body(c, _):
            return f(x, c), ()
        c, _ = jax.lax.scan(body, c0, None, length=n)
        return jnp.sum(c)
    cc = jax.jit(chained)
    c0 = f(x, h) if h is not None else f(x, None)
    _ = jax.device_get(cc(x, c0))
    t0 = time.perf_counter()
    for _ in range(outer):
        _ = jax.device_get(cc(x, c0))
    return (time.perf_counter() - t0) / (outer * n) * 1000


for C in (192, 256, 128):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)

    def scale(x, c):
        return x * 1.0001 + (c if c is not None else 0)

    ms = time_chain(lambda x, c: x * 1.0001 + c, x, x)
    gb = (2 * B * H * W * C * 2) / 1e9
    print(f"scale+add C={C}: {ms:.3f} ms  ({gb/ms*1000:.0f} GB/s)")

    hh = jnp.zeros((B, H // 2, W // 2, C), jnp.bfloat16)

    def pool(x, c):
        s5 = x.reshape(B, H // 2, 2, W // 2, 2, C)
        return s5.mean(axis=(2, 4)).astype(c.dtype) + c

    ms = time_chain(pool, x, hh)
    gb = (B * H * W * C * 2 + B * H * W // 4 * C * 2) / 1e9
    print(f"pool+add  C={C}: {ms:.3f} ms  ({gb/ms*1000:.0f} GB/s)")
