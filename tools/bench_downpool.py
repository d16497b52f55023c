"""A/B the down-block residual's skip 2x2 avg-pool + add at the SR 256^2
shape (enc_3_0_res): the split-pixel mean over axes (2,4) profiles at 1.9 ms
(~210 GB/s — a strided middle-axis reduce), vs a ~0.6 ms one-pass HBM floor.

Candidates:
  A  current: x.reshape(b,h/2,2,w/2,2,c).mean((2,4)) + h
  B  two-pass: mean adjacent W pairs, then adjacent H pairs, + h
  C  slice-sum: 0.25*(x00+x01+x10+x11) + h  (4 strided slices)
  D  reduce_window avg pool + h
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp

B, H, W, C = 16, 256, 256, 192
x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
h = jax.random.normal(jax.random.PRNGKey(1), (B, H // 2, W // 2, C), jnp.bfloat16)


def a_current(x, h):
    s5 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return s5.mean(axis=(2, 4)).astype(h.dtype) + h


def b_twopass(x, h):
    y = x.reshape(B, H, W // 2, 2, C).mean(axis=3)
    y = y.reshape(B, H // 2, 2, W // 2, C).mean(axis=2)
    return y.astype(h.dtype) + h


def c_slices(x, h):
    s5 = x.reshape(B, H // 2, 2, W // 2, 2, C)
    s = s5[:, :, 0, :, 0] + s5[:, :, 0, :, 1] + s5[:, :, 1, :, 0] + s5[:, :, 1, :, 1]
    return (s * 0.25).astype(h.dtype) + h


def d_window(x, h):
    y = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return (y * 0.25).astype(h.dtype) + h


def time_fn(f):
    g = jax.jit(lambda x, h: sum(jnp.sum(f(x, h)) for _ in range(1)))
    # chain 20 serial applications to amortize dispatch
    def chained(x, h):
        def body(c, _):
            return f(x, c), ()
        c, _ = jax.lax.scan(body, h, None, length=20)
        return jnp.sum(c)
    cc = jax.jit(chained)
    _ = jax.device_get(cc(x, h))
    t0 = time.perf_counter()
    for _ in range(3):
        _ = jax.device_get(cc(x, h))
    return (time.perf_counter() - t0) / (3 * 20) * 1000


for name, f in [("A current", a_current), ("B twopass", b_twopass),
                ("C slices", c_slices), ("D window", d_window)]:
    print(f"{name}: {time_fn(f):.3f} ms")
