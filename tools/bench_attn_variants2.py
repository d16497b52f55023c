"""Round 2 of attention-kernel A/B: isolate the softmax's VPU share.

  ident  — harness floor (no attention at all; carry update only)
  noexp  — logits matmul + PV matmul, NO softmax (p = scaled logits):
           the MXU+DMA lower bound of this kernel structure
  exp2   — softmax via exp2 with log2(e) folded into the qk scale
           (saves one VPU multiply pass if Mosaic's exp lowers to exp2)
  nomax  — exp2 softmax with a CLAMP (min(l, 40)) instead of the row-max
           subtraction: trades one [T,T] reduce pass for a cheap clamp.
           Numerics: exact whenever logits < 40 (post-GN logits measure
           |l| < ~25 at all stock shapes); diagnostic only until guarded.

Usage: python tools/bench_attn_variants2.py
"""

from __future__ import annotations

import functools
import math
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

from mm_diffusion_tpu.ops import block_attention as ba

LOG2E = math.log2(math.e)


def _fwd_kernel_v3(qkv_ref, o_ref, *, num_heads, head_dim, rows, mode):
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    t = qkv_ref.shape[1]
    cr = ba._chunk_rows(rows, t)
    ct = cr * t
    qkv = qkv_ref[...].reshape(rows * t, 3 * c)
    mask = ba._block_diag_mask(cr, t) if cr > 1 else None
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        for r0 in range(0, rows, cr):
            rsl = slice(r0 * t, r0 * t + ct)
            q = qkv[rsl, sl]
            k = qkv[rsl, c + h * head_dim : c + (h + 1) * head_dim]
            v = qkv[rsl, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
            eff_scale = scale * LOG2E if mode in ("exp2", "nomax") else scale
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * eff_scale
            if mask is not None:
                logits = logits + mask
            if mode == "noexp":
                p = (logits * 0.001).astype(v.dtype)
            elif mode == "exp2":
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp2(logits - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            elif mode == "nomax":
                p = jnp.exp2(jnp.minimum(logits, 40.0 * LOG2E))
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            else:  # stock
                m = jnp.max(logits, axis=-1, keepdims=True)
                p = jnp.exp(logits - m)
                p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
            out = jnp.dot(p, v, preferred_element_type=jnp.float32)
            o_ref[r0 : r0 + cr, :, sl] = out.astype(o_ref.dtype).reshape(
                cr, t, head_dim
            )


def attn_v3(qkv, num_heads, *, mode):
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    rows = ba._rows_per_block(n, t)
    kernel = functools.partial(
        _fwd_kernel_v3, num_heads=num_heads, head_dim=d, rows=rows, mode=mode
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, c), qkv.dtype),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, t, c3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
    )(qkv)


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
        ("base spatial ", 128, 1024, 256, 4),
        ("base temporal", 8192, 16, 256, 4),
        ("SR spatial   ", 16, 1024, 384, 6),
    ]
    for tag, n, t, c, h in cases:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c), jnp.bfloat16)
        ident = timeit(lambda x: x[..., : c], qkv)
        line = f"{tag} N={n:5d} T={t:5d}  ident {ident:6.3f}"
        for mode in ("stock", "noexp", "exp2", "nomax"):
            ms = timeit(lambda x, m=mode: attn_v3(x, h, mode=m), qkv)
            line += f"  {mode} {ms:7.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
