"""Parity tests for the layout-native block-attention kernels
(ops/block_attention.py) against their jnp reference implementations, in
Pallas interpret mode on CPU — forward and gradients, across the model's
head-dim / sequence-length matrix (D in {64, 96, 128}; ragged Tk like the
RS-MMA audio windows)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.ops import block_attention as ba

# On real TPU, fp32 dot/einsum lowers to MXU passes with bf16-granular
# accumulation order, so kernel-vs-oracle fp32 parity sits at ~1e-4 rather
# than the CPU's 2e-5 (measured: max abs 1.3e-4 over the suite's shapes).
_TPU = jax.default_backend() == "tpu"
TOL = dict(rtol=5e-4, atol=5e-4) if _TPU else dict(rtol=2e-5, atol=2e-5)
GTOL = dict(rtol=2e-3, atol=2e-3) if _TPU else dict(rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "n,t,heads,d",
    [
        (3, 64, 4, 64),  # spatial ds8-like
        (2, 100, 4, 96),  # ragged T, C=384
        (2, 128, 2, 128),  # D=128
        (1, 40, 6, 64),  # SR-style heads
    ],
)
def test_self_attention_parity(n, t, heads, d):
    c = heads * d
    qkv = jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c), jnp.float32)
    out = ba.self_attention_packed(qkv, heads)
    ref = ba.self_attention_reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_self_attention_grad_parity():
    n, t, heads, d = 2, 48, 4, 64
    c = heads * d
    qkv = jax.random.normal(jax.random.PRNGKey(1), (n, t, 3 * c), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (n, t, c), jnp.float32)

    def loss_kernel(x):
        return jnp.sum(ba.self_attention_packed(x, heads) * g)

    def loss_ref(x):
        return jnp.sum(ba.self_attention_reference(x, heads) * g)

    gk = jax.grad(loss_kernel)(qkv)
    gr = jax.grad(loss_ref)(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), **GTOL)


@pytest.mark.parametrize(
    "f,tq,tk,lw,heads,d,shift",
    [
        # the two ds8 cases are the heaviest interpret-mode compiles (~40 s
        # each on 1 CPU) — slow tier; the remaining three keep lw<F, lw==F
        # and lw==1 coverage in the fast tier
        pytest.param(16, 64, 25, 8, 8, 64, 3, marks=pytest.mark.slow),  # ds8 video-side
        pytest.param(16, 25, 64, 8, 8, 64, 5, marks=pytest.mark.slow),  # ds8 audio-side (ragged q)
        (8, 32, 16, 4, 4, 96, 0),
        (16, 16, 8, 16, 2, 64, 0),  # middle: lw == F, no shift
        (16, 48, 12, 1, 4, 64, 7),  # lw=1 (ds2)
    ],
)
def test_banded_cross_attention_parity(f, tq, tk, lw, heads, d, shift):
    c = heads * d
    n = 2
    q = jax.random.normal(jax.random.PRNGKey(0), (n, f, tq, c), jnp.float32)
    kv = jax.random.normal(jax.random.PRNGKey(1), (n, f, tk, 2 * c), jnp.float32)
    out = ba.banded_cross_attention(q, kv, jnp.int32(shift), lw, heads)
    ref = ba.banded_cross_attention_reference(q, kv, shift, lw, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_banded_cross_attention_traced_shift():
    """The shift is a traced scalar inside jit (the model's RNG draw)."""
    f, tq, tk, lw, heads, d = 8, 16, 8, 4, 2, 64
    c = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (1, f, tq, c))
    kv = jax.random.normal(jax.random.PRNGKey(1), (1, f, tk, 2 * c))

    @jax.jit
    def run(s):
        return ba.banded_cross_attention(q, kv, s, lw, heads)

    for s in (0, 3, 7):
        out = run(jnp.int32(s))
        ref = ba.banded_cross_attention_reference(q, kv, s, lw, heads)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), **TOL
        )


def test_banded_cross_attention_grad():
    f, tq, tk, lw, heads, d = 8, 12, 6, 4, 2, 64
    c = heads * d
    q = jax.random.normal(jax.random.PRNGKey(3), (1, f, tq, c))
    kv = jax.random.normal(jax.random.PRNGKey(4), (1, f, tk, 2 * c))
    g = jax.random.normal(jax.random.PRNGKey(5), (1, f, tq, c))

    def loss_kernel(q_, kv_):
        return jnp.sum(ba.banded_cross_attention(q_, kv_, jnp.int32(2), lw, heads) * g)

    def loss_ref(q_, kv_):
        return jnp.sum(
            ba.banded_cross_attention_reference(q_, kv_, 2, lw, heads) * g
        )

    gk = jax.grad(loss_kernel, argnums=(0, 1))(q, kv)
    gr = jax.grad(loss_ref, argnums=(0, 1))(q, kv)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **GTOL)


def test_bf16_numerics_close():
    """bf16 inputs: the kernel computes logits/softmax in f32 like the
    reference fp32-softmax contract (multimodal_unet.py:238)."""
    n, t, heads, d = 2, 64, 4, 64
    c = heads * d
    qkv = (
        jax.random.normal(jax.random.PRNGKey(0), (n, t, 3 * c)).astype(jnp.bfloat16)
    )
    out = ba.self_attention_packed(qkv, heads)
    ref = ba.self_attention_reference(qkv.astype(jnp.float32), heads)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("n,t", [(32, 16), (8, 64), (16, 8)])
def test_self_attention_batched_rows_parity(n, t):
    """Tiny-T inputs batch multiple rows per block behind a block-diagonal
    mask — results must still match per-row attention exactly."""
    heads, d = 4, 64
    c = heads * d
    assert ba._rows_per_block(n, t) > 1
    qkv = jax.random.normal(jax.random.PRNGKey(7), (n, t, 3 * c), jnp.float32)
    out = ba.self_attention_packed(qkv, heads)
    ref = ba.self_attention_reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_self_attention_batched_rows_grad():
    n, t, heads, d = 16, 16, 2, 64
    c = heads * d
    qkv = jax.random.normal(jax.random.PRNGKey(8), (n, t, 3 * c), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(9), (n, t, c), jnp.float32)
    gk = jax.grad(lambda x: jnp.sum(ba.self_attention_packed(x, heads) * g))(qkv)
    gr = jax.grad(lambda x: jnp.sum(ba.self_attention_reference(x, heads) * g))(qkv)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), **GTOL)


@pytest.mark.parametrize(
    "f,tq,tk,lw,shift",
    [(16, 16, 25, 8, 3), (16, 16, 25, 16, 0), (8, 32, 16, 1, 5)],
)
def test_banded_xla_roll_path_parity(f, tq, tk, lw, shift):
    heads, d = 4, 64
    c = heads * d
    q = jax.random.normal(jax.random.PRNGKey(0), (2, f, tq, c))
    kv = jax.random.normal(jax.random.PRNGKey(1), (2, f, tk, 2 * c))
    out = jax.jit(
        lambda s: ba.banded_cross_attention_xla(q, kv, s, lw, heads)
    )(jnp.int32(shift))
    ref = ba.banded_cross_attention_reference(q, kv, shift, lw, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_dispatchers_run_on_cpu():
    qkv = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 3 * 128))
    out = ba.dispatch_self_attention(qkv, 2)
    assert out.shape == (4, 32, 128)
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 16, 128))
    kv = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 256))
    out = ba.dispatch_banded_attention(q, kv, jnp.int32(1), 4, 2)
    assert out.shape == (1, 8, 16, 128)


def test_self_attention_bwd_fits_guard(monkeypatch):
    # The stock config's T=1024 spatial shape fits forward (12.5 MB bound)
    # but its backward tiles (~4.5 RT^2 f32) exceed VMEM — the guard must
    # split, or the real-chip train step OOMs scoped vmem (round-2 bug).
    # Pin the STOCK 16 MiB window explicitly: the unset-env default is
    # platform-dependent (64 MiB on real v4/v5/v6 chips, where the backward
    # legitimately fits one-shot — the regime the last assert covers).
    monkeypatch.setenv("MMDIFF_VMEM_LIMIT_MB", "16")
    assert ba.self_attention_fits(128, 1024, 256, 4)
    assert not ba.self_attention_bwd_fits(128, 1024, 256, 4)
    # deeper levels fit both ways
    assert ba.self_attention_bwd_fits(128, 256, 384, 6)
    assert ba.self_attention_bwd_fits(128, 64, 512, 8)
    # a raised scoped-VMEM window admits the one-shot backward at T=1024
    # (MMDIFF_VMEM_LIMIT_MB scales every fit-guard budget)
    monkeypatch.setenv("MMDIFF_VMEM_LIMIT_MB", "64")
    assert ba.self_attention_bwd_fits(128, 1024, 256, 4)


@pytest.mark.parametrize("lw,shift", [(1, 0), (1, 2), (3, 1)])
def test_banded_packed_parity(lw, shift):
    f, tq, tk, heads, d = 4, 64, 40, 2, 64
    c = heads * d
    key = jax.random.PRNGKey(3)
    q_src = jax.random.normal(key, (2, f, tq, 3 * c), jnp.float32)
    kv_src = jax.random.normal(jax.random.PRNGKey(4), (2, f, tk, 3 * c), jnp.float32)
    out = ba.banded_cross_attention_packed(q_src, kv_src, shift, lw, heads, c)
    ref = ba.banded_cross_attention_reference(
        q_src[..., :c], kv_src[..., c:], shift, lw, heads
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_banded_packed_grad_flows_to_packed_lanes():
    f, tq, tk, heads, d = 2, 16, 8, 2, 32
    c = heads * d
    q_src = jax.random.normal(jax.random.PRNGKey(5), (1, f, tq, 3 * c), jnp.float32)
    kv_src = jax.random.normal(jax.random.PRNGKey(6), (1, f, tk, 3 * c), jnp.float32)

    def loss(q_src, kv_src):
        return jnp.sum(
            ba.banded_cross_attention_packed(q_src, kv_src, 0, 1, heads, c) ** 2
        )

    dq, dkv = jax.grad(loss, argnums=(0, 1))(q_src, kv_src)
    # grads live only in the q lanes of q_src and the kv lanes of kv_src
    assert float(jnp.abs(dq[..., :c]).sum()) > 0
    assert float(jnp.abs(dq[..., c:]).sum()) == 0.0
    assert float(jnp.abs(dkv[..., c:]).sum()) > 0
    assert float(jnp.abs(dkv[..., :c]).sum()) == 0.0


def test_self_attention_chunked_bwd_parity():
    """The flash-style q-chunked backward (used when the one-shot backward
    tiles exceed VMEM) must match the reference VJP."""
    n, t, heads, d = 2, 128, 2, 64
    c = heads * d
    qkv = jax.random.normal(jax.random.PRNGKey(11), (n, t, 3 * c), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(12), (n, t, c), jnp.float32)
    got = ba._self_attention_bwd_chunked_pallas(qkv, g, heads, qblock=32)
    ref = jax.vjp(lambda x: ba.self_attention_reference(x, heads), qkv)[1](g)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **GTOL)


@pytest.mark.slow
def test_banded_bwd_lw1_kernel_parity():
    """The lw==1 banded backward kernel (bijective frame scatter) must match
    the reference VJP, including the packed-lane zero routing."""
    f, tq, tk, heads, d = 4, 32, 16, 2, 64
    c = heads * d
    q_src = jax.random.normal(jax.random.PRNGKey(21), (2, f, tq, 3 * c), jnp.float32)
    kv_src = jax.random.normal(jax.random.PRNGKey(22), (2, f, tk, 3 * c), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(23), (2, f, tq, c), jnp.float32)
    for shift in (0, 1, 3):
        dq_src, dkv_src = ba._banded_bwd_lw1_pallas(q_src, kv_src, g, shift, heads, c)
        ref_fn = lambda q_, kv_: ba.banded_cross_attention_reference(
            q_, kv_, shift, 1, heads
        )
        dq_ref, dkv_ref = jax.vjp(ref_fn, q_src[..., :c], kv_src[..., c:])[1](g)
        np.testing.assert_allclose(
            np.asarray(dq_src[..., :c]), np.asarray(dq_ref), **GTOL
        )
        assert float(jnp.abs(dq_src[..., c:]).sum()) == 0.0
        np.testing.assert_allclose(
            np.asarray(dkv_src[..., c:]), np.asarray(dkv_ref), **GTOL
        )
        assert float(jnp.abs(dkv_src[..., :c]).sum()) == 0.0


@pytest.mark.parametrize(
    "lw,shift,f",
    [(2, 0, 4), (3, 1, 4), (4, 2, 4),
     pytest.param(4, 3, 8, marks=pytest.mark.slow)],
)
def test_banded_bwd_oneshot_kernel_parity(lw, shift, f):
    """The lw>1 one-shot banded backward (lw dkv partials through modular
    index_maps, summed) must match the reference VJP, including the
    full-window case lw == F."""
    tq, tk, heads, d = 32, 16, 2, 64
    c = heads * d
    q_src = jax.random.normal(jax.random.PRNGKey(31), (2, f, tq, 3 * c), jnp.float32)
    kv_src = jax.random.normal(jax.random.PRNGKey(32), (2, f, tk, 3 * c), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(33), (2, f, tq, c), jnp.float32)
    dq_src, dkv_src = ba._banded_bwd_oneshot_pallas(
        q_src, kv_src, g, shift, lw, heads, c
    )
    ref_fn = lambda q_, kv_: ba.banded_cross_attention_reference(
        q_, kv_, shift, lw, heads
    )
    dq_ref, dkv_ref = jax.vjp(ref_fn, q_src[..., :c], kv_src[..., c:])[1](g)
    np.testing.assert_allclose(
        np.asarray(dq_src[..., :c]), np.asarray(dq_ref), **GTOL
    )
    assert float(jnp.abs(dq_src[..., c:]).sum()) == 0.0
    np.testing.assert_allclose(
        np.asarray(dkv_src[..., c:]), np.asarray(dkv_ref), **GTOL
    )
    assert float(jnp.abs(dkv_src[..., :c]).sum()) == 0.0
