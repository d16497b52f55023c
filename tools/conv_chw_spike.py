"""Spike: channel-major (CHW) direct 3x3 conv as a Pallas kernel.

Premise (BASELINE.md round-2 refinement): XLA's conv emitter maps the GEMM
as [M=pixels, K=9*Ci] x [K, N=Co]; Co=192 pads the stationary N dim to two
128-lane tiles (75% MXU).  Computing the TRANSPOSED output instead —
out_T[Co, px] = W'[Co, 9*Ci] x im2col[9*Ci, px] — streams Co on the M dim
(no padding; M is the streamed dimension) with K=1728 (13.5 tiles, 96.4%)
and N=pixels (128-multiples, 100%).  If this kernel beats XLA's time on the
SR U-Net's hot 192->192 @ 16x256^2 shape, the SR conv stack (~132 ms, ~83%
of the eval) can drop toward the 102 ms un-padded floor.

Layout: activations flow as [B, C, H*W] (flat pixels).  In VMEM a block is
[C, TH*W]: C on sublanes, pixels on lanes — so the dy=+-1 row shifts are
W-lane (tile-aligned, 256 = 2 vregs) slices of a haloed concat, and the
dx=+-1 column shifts are done in i32 bitcast space (two bf16 lanes per i32
lane: roll + shift/or reassembles the pair; Mosaic has no sub-32-bit lane
rotate).  The im2col scratch [9*Ci, TH*W] shares the same layout, so every
tap write is a pure vreg copy, and the single GEMM needs no reshapes.

Usage:
  JAX_PLATFORMS=cpu python tools/conv_chw_spike.py check   # interpret math check
  python tools/conv_chw_spike.py bench                     # TPU timing vs XLA
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
from mm_diffusion_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_dx(win, dx: int, w_px: int, interpret: bool):
    """y[.., p] = win[.., p+dx] with zeros where (p+dx) crosses a row edge
    (flat-pixel layout: rows are w_px-lane runs).  bf16-safe lane shift."""
    ci, npx = win.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, npx), 1)
    if interpret:  # interpret mode: plain roll works for any dtype
        y = jnp.roll(win, -dx, axis=1)
    elif win.dtype.itemsize == 4:
        y = pltpu.roll(win, (-dx) % npx, 1)
    else:
        # two 16-bit lanes per i32 lane: reassemble the shifted pair stream
        l = pltpu.bitcast(win, jnp.int32)  # [ci, npx//2]
        if dx == 1:
            ln = pltpu.roll(l, (npx // 2) - 1, 1)  # l[k+1]
            y32 = jax.lax.shift_right_logical(l, jnp.int32(16)) | jax.lax.shift_left(
                ln, jnp.int32(16)
            )
        else:
            lp = pltpu.roll(l, 1, 1)  # l[k-1]
            y32 = jax.lax.shift_left(l, jnp.int32(16)) | jax.lax.shift_right_logical(
                lp, jnp.int32(16)
            )
        y = pltpu.bitcast(y32, win.dtype)
    # zero the positions whose source crossed a row boundary (or the array)
    col = pos % w_px
    bad = (col == (w_px - 1)) if dx == 1 else (col == 0)
    return jnp.where(bad, jnp.zeros_like(y), y)


def _kernel(
    x_ref, top_ref, bot_ref, w_ref, o_ref, col_ref, *, ci, co, th, w_px,
    interpret,
):
    i = pl.program_id(1)
    nblk = pl.num_programs(1)
    cur = x_ref[0]                    # [Ci, TH*W]
    top = top_ref[0]                  # [Ci, W] — row above the block
    bot = bot_ref[0]                  # [Ci, W] — row below
    top = jnp.where(i == 0, jnp.zeros_like(top), top)
    bot = jnp.where(i == nblk - 1, jnp.zeros_like(bot), bot)
    full = jnp.concatenate([top, cur, bot], axis=1)  # [Ci, (TH+2)*W]
    npx = th * w_px

    diag = int(os.environ.get("CHW_DIAG", "0"))  # 1: no dx shifts; 2: one tap only
    for tap, (dy, dx) in enumerate(
        (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ):
        if diag == 2 and tap > 0:
            break
        off = (dy + 1) * w_px  # 0 / W / 2W — tile-aligned lane slice
        win = full[:, off : off + npx]
        if dx and diag == 0:
            win = _shift_dx(win, dx, w_px, interpret)
        col_ref[tap * ci : (tap + 1) * ci, :] = win

    acc = jax.lax.dot_general(
        w_ref[...], col_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Co, TH*W]
    o_ref[0] = acc.astype(o_ref.dtype)


def conv3x3_chw(x, w, *, th=8, interpret=False, vmem_mb=100):
    """3x3 SAME conv, channel-major flat-pixel layout: x [B, Ci, H, W] or
    [B, Ci, H*W] + explicit h; w [Co, Ci, 3, 3] -> [B, Co, H, W]."""
    if x.ndim == 4:
        b, ci, h, w_px = x.shape
        x = x.reshape(b, ci, h * w_px)
    else:
        raise ValueError("pass [B, Ci, H, W]")
    co = w.shape[0]
    assert h % th == 0
    wt = jnp.transpose(w, (2, 3, 1, 0)).reshape(9 * ci, co).T  # [Co, (dy,dx,Ci)]
    wt = jnp.asarray(wt, x.dtype)
    kern = functools.partial(
        _kernel, ci=ci, co=co, th=th, w_px=w_px, interpret=interpret
    )
    nblk = h // th
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b, nblk),
        in_specs=[
            pl.BlockSpec((1, ci, th * w_px), lambda bb, i: (bb, 0, i)),
            # W-lane halo rows, clamped at the image edges (kernel zeros them)
            pl.BlockSpec(
                (1, ci, w_px),
                lambda bb, i: (bb, 0, jnp.maximum(i * th - 1, 0)),
            ),
            pl.BlockSpec(
                (1, ci, w_px),
                lambda bb, i: (bb, 0, jnp.minimum(i * th + th, h - 1)),
            ),
            pl.BlockSpec((co, 9 * ci), lambda bb, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, co, th * w_px), lambda bb, i: (bb, 0, i)),
        scratch_shapes=[pltpu.VMEM((9 * ci, th * w_px), x.dtype)],
    )
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20
        )
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, co, h * w_px), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        **kwargs,
    )(x, x, x, wt)
    return out.reshape(b, co, h, w_px)


def check():
    b, ci, co, h, w_px = 2, 16, 8, 32, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, ci, h, w_px), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (co, ci, 3, 3), jnp.float32) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    out = conv3x3_chw(x, w, th=8, interpret=True)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"interpret check f32: max err {err:.2e} (shape {out.shape})")
    assert err < 1e-4, err


def bench():
    print("backend:", jax.default_backend(), jax.devices()[0])
    B, CI, CO, H, W = 16, 192, 192, 256, 256
    x_chw = jax.random.normal(jax.random.PRNGKey(0), (B, CI, H, W), jnp.bfloat16)
    x_hwc = jnp.transpose(x_chw, (0, 2, 3, 1))
    w = jax.random.normal(jax.random.PRNGKey(1), (CO, CI, 3, 3), jnp.bfloat16) * 0.05
    w_hwio = jnp.transpose(w, (2, 3, 1, 0))
    flops = 2 * B * H * W * 9 * CI * CO

    def timeit(fn, arg, n_chain=10, n_outer=2):
        def chained(a):
            def body(c, _):
                o = fn(c)
                return 0.9 * c + 0.1 * o.astype(c.dtype), ()
            c, _ = jax.lax.scan(body, a, None, length=n_chain)
            return jnp.mean(c)
        compiled = jax.jit(chained)
        _ = jax.device_get(compiled(arg))
        t0 = time.perf_counter()
        for _ in range(n_outer):
            _ = jax.device_get(compiled(arg))
        return (time.perf_counter() - t0) / (n_outer * n_chain) * 1e3

    ms_hwc = timeit(
        lambda a: jax.lax.conv_general_dilated(
            a, w_hwio, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ),
        x_hwc,
    )
    print(f"XLA NHWC:   {ms_hwc:7.3f} ms  ({flops/ms_hwc/1e9:.0f} GF/s)", flush=True)
    for th in (8, 16, 32):
        try:
            ms = timeit(lambda a, th=th: conv3x3_chw(a, w, th=th), x_chw)
            print(
                f"pallas CHW (th={th}): {ms:7.3f} ms  ({flops/ms/1e9:.0f} GF/s)",
                flush=True,
            )
        except Exception as e:
            print(f"pallas CHW (th={th}) failed: {type(e).__name__}: {str(e)[:160]}")


def gemm():
    """Isolate the kernel's GEMM: [Co, 9Ci] x [9Ci, px-block] per grid step,
    RHS streamed from HBM (mirrors the conv's per-block data flow).  If this
    alone can't approach peak, the transposed-output premise is dead on
    Mosaic regardless of the im2col engineering."""
    print("backend:", jax.default_backend(), jax.devices()[0])
    co, k = 192, 9 * 192
    for npx_blk, nblk in ((4096, 256), (2048, 512), (8192, 128)):
        a = jax.random.normal(jax.random.PRNGKey(0), (co, k), jnp.bfloat16)
        b = jax.random.normal(jax.random.PRNGKey(1), (nblk, k, npx_blk), jnp.bfloat16)

        def kern(a_ref, b_ref, o_ref):
            o_ref[0] = jax.lax.dot_general(
                a_ref[...], b_ref[0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

        fn = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((nblk, co, npx_blk), jnp.bfloat16),
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec((co, k), lambda i: (0, 0)),
                pl.BlockSpec((1, k, npx_blk), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, co, npx_blk), lambda i: (i, 0, 0)),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
        )
        flops = 2 * co * k * npx_blk * nblk

        compiled = jax.jit(lambda b, a=a, fn=fn: jnp.mean(fn(a, b)))
        _ = jax.device_get(compiled(b))
        t0 = time.perf_counter()
        n_outer = 3
        for _ in range(n_outer):
            _ = jax.device_get(compiled(b))
        ms = (time.perf_counter() - t0) / n_outer * 1e3
        print(
            f"gemm [192x1728]x[1728x{npx_blk}] x{nblk}: {ms:7.3f} ms "
            f"({flops/ms/1e9:.0f} GF/s, {flops/ms/1e9/197e3*100:.0f}% peak)",
            flush=True,
        )


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "bench"
    {"check": check, "bench": bench, "gemm": gemm}[mode]()
