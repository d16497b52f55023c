"""Microbench: up-conv formulations at the SR decoder's hot up-site.

Context: the r4 SR profile shows ~7 ms of copies/converts clustered at
dec_14_1 (SubpixelUpConv -> norm_out) — the interleave (stack+reshape)
output layout blocks fusion with the GN stats/normalize consumer.  Compare,
at the dec_14_1 shape ([16,128,128,192] -> [16,256,256,192]) WITH the
norm+FiLM+silu+conv3x3 consumer attached:

  a) naive: nearest_up2 -> SAME conv3x3 (hi-res, 36 MACs/px)
  b) subpixel (current): VALID 2x2 phase conv + stack/reshape interleave
  c) lhs-dilated: one conv_general_dilated with lhs_dilation=(2,2) and the
     phase-collapsed 4x4 kernel K4 = A w A^T, A = [[1,0,0],[1,1,0],[0,1,1],
     [0,0,1]] — output lands directly in NHWC, no interleave.

Run on the real chip: python tools/bench_subpixel.py
"""

from __future__ import annotations

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

B, H, W, CI, CO = 16, 128, 128, 192, 192
DT = jnp.bfloat16


def collapse_rows(kernel):
    """[3,3,Ci,Co] -> per-axis phase collapse, A w A^T -> [4,4,Ci,Co]."""
    a = jnp.asarray(
        [[1, 0, 0], [1, 1, 0], [0, 1, 1], [0, 0, 1]], kernel.dtype
    )  # [4,3]
    k = jnp.einsum("mi,ijco->mjco", a, kernel)
    return jnp.einsum("nj,mjco->mnco", a, k)


def up_naive(x, kernel, bias):
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c)).reshape(
        b, 2 * h, 2 * w, c
    )
    out = jax.lax.conv_general_dilated(
        y.astype(DT), kernel.astype(DT), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(DT)


def up_subpixel(x, kernel, bias):
    """Current SubpixelUpConv formulation (layers.py)."""
    bsz, h, w, ci = x.shape
    co = kernel.shape[-1]
    r0 = jnp.stack([kernel[0], kernel[1] + kernel[2]], axis=0)
    r1 = jnp.stack([kernel[0] + kernel[1], kernel[2]], axis=0)
    phase = []
    for ra in (r0, r1):
        phase.append(jnp.stack([ra[:, 0], ra[:, 1] + ra[:, 2]], axis=1))
        phase.append(jnp.stack([ra[:, 0] + ra[:, 1], ra[:, 2]], axis=1))
    k2 = jnp.concatenate(phase, axis=-1).astype(DT)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xp.astype(DT), k2, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    t = jnp.stack(
        [
            jnp.stack(
                [y[:, a : a + h, b : b + w, (2 * a + b) * co : (2 * a + b + 1) * co]
                 for b in (0, 1)],
                axis=3,
            )
            for a in (0, 1)
        ],
        axis=2,
    )
    return t.reshape(bsz, 2 * h, 2 * w, co) + bias.astype(DT)


def up_dilated(x, kernel, bias):
    k4 = collapse_rows(kernel).astype(DT)
    out = jax.lax.conv_general_dilated(
        x.astype(DT), k4, (1, 1), padding=((2, 2), (2, 2)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + bias.astype(DT)


def consumer(h, scale, shift, k3, groups=32):
    """norm_out + FiLM + silu + conv3x3 (the ResBlock tail at hi-res)."""
    f32 = h.astype(jnp.float32)
    b, hh, ww, c = h.shape
    xg = f32.reshape(b, -1, groups, c // groups)
    mean = xg.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xg - mean).mean(axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, hh, ww, c)
    y = y * (1 + scale) + shift
    y = jax.nn.silu(y).astype(DT)
    return jax.lax.conv_general_dilated(
        y, k3.astype(DT), (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def timeit(fn, args, n_chain=20, n_outer=3):
    def chained(x, *rest):
        def body(c, _):
            out = fn(c, *rest)
            # keep shapes: slice the 2x-upsampled output back down
            return out[:, ::2, ::2, :CI].astype(x.dtype), ()

        c, _ = jax.lax.scan(body, x, None, length=n_chain)
        return jnp.mean(c)

    compiled = jax.jit(chained)
    _ = jax.device_get(compiled(*args))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(compiled(*args))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1000


def main():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, CI), DT)
    kernel = jnp.asarray(rng.randn(3, 3, CI, CO) * 0.02, jnp.float32)
    bias = jnp.zeros((CO,), jnp.float32)
    k3 = jnp.asarray(rng.randn(3, 3, CO, CO) * 0.02, jnp.float32)
    scale = jnp.asarray(rng.randn(B, 1, 1, CO) * 0.1, jnp.float32)
    shift = jnp.asarray(rng.randn(B, 1, 1, CO) * 0.1, jnp.float32)

    # numerics: all three must agree (fp32)
    xf = x.astype(jnp.float32)

    def fp32_run(f):
        global DT
        return f(xf, kernel, bias)

    na = np.asarray(up_naive(xf, kernel, bias), np.float32)
    sp = np.asarray(up_subpixel(xf, kernel, bias), np.float32)
    di = np.asarray(up_dilated(xf, kernel, bias), np.float32)
    print("max|naive-subpixel| =", np.abs(na - sp).max())
    print("max|naive-dilated|  =", np.abs(na - di).max())

    for name, f in [("naive", up_naive), ("subpixel", up_subpixel), ("dilated", up_dilated)]:
        t_alone = timeit(f, (x, kernel, bias))
        t_ctx = timeit(
            lambda xx, k, bb: consumer(f(xx, k, bb), scale, shift, k3), (x, kernel, bias)
        )
        print(f"{name:10s} alone {t_alone:7.3f} ms   +consumer {t_ctx:7.3f} ms")


if __name__ == "__main__":
    main()
