"""A/B kernel variants of the packed self-attention forward at the model's
hot shapes, to decide which restructurings are worth landing:

  hoist  — slice each head's q/k/v once per block ([RT, D] lane extraction)
           instead of inside every chunk iteration (chunks then row-slice the
           sublane dim, which is tile-aligned and free).
  recip  — p * (1/denom) instead of p / denom (VPU divide is multi-pass).
  rows   — raise the tiny-T rows-per-block cap so huge-N/T=16 temporal
           passes run fewer grid steps (cap x4 under the 64 MiB window).

Usage: python tools/bench_attn_variants.py
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


def _fwd_kernel_v2(
    qkv_ref, o_ref, *, num_heads, head_dim, rows, hoist, recip
):
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    t = qkv_ref.shape[1]
    cr = ba._chunk_rows(rows, t)
    ct = cr * t
    qkv = qkv_ref[...].reshape(rows * t, 3 * c)
    mask = ba._block_diag_mask(cr, t) if cr > 1 else None
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        if hoist:
            qh = qkv[:, sl]
            kh = qkv[:, c + h * head_dim : c + (h + 1) * head_dim]
            vh = qkv[:, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
        for r0 in range(0, rows, cr):
            rsl = slice(r0 * t, r0 * t + ct)
            if hoist:
                q, k, v = qh[rsl], kh[rsl], vh[rsl]
            else:
                q = qkv[rsl, sl]
                k = qkv[rsl, c + h * head_dim : c + (h + 1) * head_dim]
                v = qkv[rsl, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if mask is not None:
                logits = logits + mask
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            denom = jnp.sum(p, axis=-1, keepdims=True)
            if recip:
                p = (p * (1.0 / denom)).astype(v.dtype)
            else:
                p = (p / denom).astype(v.dtype)
            out = jnp.dot(p, v, preferred_element_type=jnp.float32)
            o_ref[r0 : r0 + cr, :, sl] = out.astype(o_ref.dtype).reshape(
                cr, t, head_dim
            )


def attn_v2(qkv, num_heads, *, hoist, recip, rows_cap=None):
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    if rows_cap is None:
        rows = ba._rows_per_block(n, t)
    else:
        rows, r = 1, 1
        while r * t <= rows_cap and r <= n:
            if n % r == 0:
                rows = r
            r += 1
    kernel = functools.partial(
        _fwd_kernel_v2, num_heads=num_heads, head_dim=d, rows=rows,
        hoist=hoist, recip=recip,
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
        ("SR mid       ", 16, 256, 768, 12),
    ]
    for tag, n, t, c, h in cases:
        qkv = jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c), jnp.bfloat16)
        base = timeit(lambda x: ba.self_attention_packed(x, h), qkv)
        line = f"{tag} N={n:5d} T={t:5d}  current {base:7.3f}"
        for name, kw in (
            ("hoist", dict(hoist=True, recip=False)),
            ("hoist+recip", dict(hoist=True, recip=True)),
            ("hoist+recip+cap8k", dict(hoist=True, recip=True, rows_cap=8192)),
        ):
            ms = timeit(lambda x, kw=kw: attn_v2(x, h, **kw), qkv)
            line += f"  {name} {ms:7.3f}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
