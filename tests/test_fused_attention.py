"""Fused (flash) attention dispatch tests.

On CPU the dispatcher falls back to the einsum path, so kernel parity is
checked by invoking the Pallas kernel in TPU-interpret mode, including the
ragged-KV padding + segment-id masking path used by RS-MMA windows.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.models.attention import qkv_attention
from mm_diffusion_tpu.ops import fused_attention as fu


def test_cpu_dispatch_falls_back():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 256, 2, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 2, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 256, 2, 64))
    out = fu.flash_mha(q, k, v)
    ref = qkv_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("t_k", [256, 200])  # 200 exercises padding + mask
def test_kernel_parity_interpret_mode(t_k):
    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, t_q, h, d = 2, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, t_q, d))
    k = jax.random.normal(ks[1], (b, h, t_k, d))
    v = jax.random.normal(ks[2], (b, h, t_k, d))

    # reference einsum on the unpadded problem
    ref = qkv_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
    )
    ref = jnp.swapaxes(ref, 1, 2)

    pad = (-t_k) % 128
    k_pad = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    v_pad = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    seg = None
    if pad:
        q_seg = jnp.ones((b, t_q), jnp.int32)
        kv_seg = (jnp.arange(t_k + pad) < t_k).astype(jnp.int32)[None].repeat(b, 0)
        seg = fa.SegmentIds(q=q_seg, kv=kv_seg)

    with pltpu.force_tpu_interpret_mode():
        out = fa.flash_attention(
            q, k_pad, v_pad, segment_ids=seg, sm_scale=1.0 / math.sqrt(d)
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_use_flash_policy():
    assert not fu._use_flash(64, 64, 64)  # too short
    # policy depends on backend; on CPU always False
    if jax.default_backend() != "tpu":
        assert not fu._use_flash(1024, 512, 64)


def test_kernel_vjp_parity_interpret_mode():
    """The flash kernel's custom VJP (used by TPU training) must match the
    einsum path's gradients."""
    import math

    from jax.experimental.pallas import tpu as pltpu
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, t, d = 1, 2, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, h, t, d))
    k = jax.random.normal(ks[1], (b, h, t, d))
    v = jax.random.normal(ks[2], (b, h, t, d))

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, sm_scale=1 / math.sqrt(d)) ** 2)

    def loss_ref(q, k, v):
        o = qkv_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2)
        )
        return jnp.sum(jnp.swapaxes(o, 1, 2) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)
