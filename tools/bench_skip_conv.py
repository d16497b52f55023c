"""A/B the decoder skip projection at the SR hot shape: 1x1 conv over the
virtual concat (192+192) -> 192 at 16x256^2.

  split   — PointwiseFromParts (production): one conv per part, partials
            summed.  Each part's K=192 pads to 2 MXU tiles -> 4 K*N tile
            passes total (profiled 1.63 ms/op, ~48% MXU).
  concat  — materialize the concat, single conv at K=384 (3 exact tiles)
            -> 3 tile passes + one concat write/read.
  gemm    — single pallas GEMM reading BOTH parts per block and K-stacking
            in VMEM (no HBM concat): 3 tile passes, no extra traffic.

Usage: python tools/bench_skip_conv.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mm_diffusion_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mm_diffusion_tpu.models.layers import PointwiseFromParts

B, H, W, C = 16, 256, 256, 192
CO = 192


def _gemm_kernel(a_ref, b_ref, w1_ref, w2_ref, o_ref):
    a = a_ref[0]  # [TH*W, C]
    b = b_ref[0]
    acc = jax.lax.dot_general(
        a, w1_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        b, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = acc.astype(o_ref.dtype)


def skip_gemm(x1, x2, w, th=16):
    b, h, w_px, c = x1.shape
    x1 = x1.reshape(b, h * w_px, c)
    x2 = x2.reshape(b, h * w_px, c)
    w1, w2 = w[:c], w[c:]
    nblk = h // th
    out = pl.pallas_call(
        _gemm_kernel,
        out_shape=jax.ShapeDtypeStruct((b * nblk, th * w_px, CO), jnp.bfloat16),
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, th * w_px, c), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, th * w_px, c), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((c, CO), lambda bb, i: (0, 0)),
            pl.BlockSpec((c, CO), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, th * w_px, CO), lambda bb, i: (bb * nblk + i, 0, 0)
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(x1, x2, jnp.asarray(w1, jnp.bfloat16), jnp.asarray(w2, jnp.bfloat16))
    return out.reshape(b, h, w_px, CO)


def timeit(fn, args, n_chain=20, n_outer=2):
    def chained(a):
        def body(c, _):
            y = fn(c, a[1])
            return (0.9 * c[0] + 0.1 * y).astype(c[0].dtype), ()

        # carry only part 1; part 2 constant
        c, _ = jax.lax.scan(body, a[0], None, length=n_chain)
        return jnp.mean(c)

    def fn2(c, b):
        return fn((c, b))

    def chained2(a):
        def body(c, _):
            y = fn((c, a[1]))
            return 0.9 * c + 0.1 * y.astype(c.dtype), ()

        c, _ = jax.lax.scan(body, a[0], None, length=n_chain)
        return jnp.mean(c)

    g = jax.jit(chained2)
    _ = jax.device_get(g(args))
    t0 = time.perf_counter()
    for _ in range(n_outer):
        _ = jax.device_get(g(args))
    return (time.perf_counter() - t0) / (n_outer * n_chain) * 1000


def main():
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind)
    k = jax.random.PRNGKey(0)
    x1 = jax.random.normal(k, (B, H, W, C), jnp.bfloat16)
    x2 = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.bfloat16)
    wfull = jax.random.normal(jax.random.PRNGKey(2), (2 * C, CO), jnp.float32) * 0.05

    # correctness vs split reference
    ref = jnp.concatenate([x1, x2], -1).astype(jnp.bfloat16) @ wfull.astype(
        jnp.bfloat16
    )
    got = skip_gemm(x1, x2, wfull)
    err = float(
        jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32)))
    )
    print(f"gemm check: max err {err:.3e}")

    pw = PointwiseFromParts(CO, 2 * C, lead_ones=2)
    vars_ = {
        "params": {
            "kernel": wfull.reshape(1, 1, 2 * C, CO),
            "bias": jnp.zeros((CO,), jnp.float32),
        }
    }

    def split(parts):
        return pw.apply(vars_, parts)

    def concat(parts):
        xc = jnp.concatenate(parts, axis=-1)
        return jax.lax.conv_general_dilated(
            xc,
            wfull.reshape(1, 1, 2 * C, CO).astype(jnp.bfloat16),
            (1, 1),
            "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    for name, fn in (
        ("split ", split),
        ("concat", concat),
        ("gemm  ", lambda p: skip_gemm(p[0], p[1], wfull)),
    ):
        ms = timeit(fn, (x1, x2))
        print(f"{name}: {ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
