"""Coverage for remaining code paths: gradient checkpointing (remat),
DPM guidance wrappers, preview sampling media dump, image datasets."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.configs import create_gaussian_diffusion, create_model_config
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.samplers import NoiseScheduleVP, wrap_model



def test_remat_forward_and_grad():
    """use_checkpoint=True must produce identical outputs and valid grads
    (the reference's CheckpointFunction path, nn.py:233-279)."""
    kw = dict(
        video_size="2,3,8,8",
        audio_size="1,128",
        num_channels=16,
        num_res_blocks=1,
        cross_attention_resolutions="2",
        cross_attention_windows="1",
        cross_attention_shift=False,
        video_attention_resolutions="2",
        audio_attention_resolutions="-1",
        channel_mult="1,2",
        num_heads=2,
        dtype="float32",
    )
    m_plain = MultimodalUNet(create_model_config(**kw))
    m_remat = MultimodalUNet(create_model_config(use_checkpoint=True, **kw))
    v = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 3))
    a = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 1))
    t = jnp.array([3])
    variables = m_plain.init({"params": jax.random.PRNGKey(2)}, v, a, t)

    o1 = m_plain.apply(variables, v, a, t)
    o2 = m_remat.apply(variables, v, a, t)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]), rtol=1e-5, atol=1e-6)

    def loss(params, model):
        vo, ao = model.apply({"params": params}, v, a, t)
        return jnp.mean(vo**2) + jnp.mean(ao**2)

    g1 = jax.grad(loss)(variables["params"], m_plain)
    g2 = jax.grad(loss)(variables["params"], m_remat)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a_, b_ in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_), rtol=1e-4, atol=1e-6)


def test_wrap_model_classifier_guidance():
    """Classifier guidance: eps' = eps - scale * sigma_t * grad log p
    (parity: model_wrapper classifier branch, multimodal_dpm_solver_plus.py:351-357)."""
    ns = NoiseScheduleVP.from_betas(np.linspace(1e-4, 0.02, 100))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    eps = jax.random.normal(jax.random.PRNGKey(1), (2, 8))

    def raw(xx, t_disc):
        return eps

    def classifier_fn(xx, t_disc, cond):
        # log p = -0.5 |x|^2 => grad = -x
        return -0.5 * jnp.sum(xx**2, axis=-1)

    scale = 2.0
    model_fn = wrap_model(
        raw, ns, guidance_type="classifier", guidance_scale=scale,
        classifier_fn=classifier_fn,
    )
    t_cont = jnp.asarray(0.5)
    out = model_fn(x, t_cont)
    sigma = ns.marginal_std(jnp.full((2,), 0.5))
    expect = eps - scale * sigma[:, None] * (-x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-4, atol=1e-5)


def test_wrap_model_classifier_free_guidance():
    """CFG: out = uncond + s*(cond - uncond), computed via batch doubling
    (parity: ref :358-366)."""
    ns = NoiseScheduleVP.from_betas(np.linspace(1e-4, 0.02, 100))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8))
    cond = jnp.ones((2, 4))
    uncond = jnp.zeros((2, 4))

    def raw(xx, t_disc, c):
        # eps depends linearly on the condition's mean
        return xx * 0.1 + jnp.mean(c, axis=-1, keepdims=True)

    model_fn = wrap_model(
        raw, ns, guidance_type="classifier-free", guidance_scale=3.0,
        condition=cond, unconditional_condition=uncond,
    )
    out = model_fn(x, jnp.asarray(0.7))
    e_uncond = x * 0.1 + 0.0
    e_cond = x * 0.1 + 1.0
    expect = e_uncond + 3.0 * (e_cond - e_uncond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)


def test_preview_sampling_writes_media(tmp_path):
    from mm_diffusion_tpu.data import load_synthetic_data
    from mm_diffusion_tpu.train import TrainLoop

    cfg = create_model_config(
        video_size="2,3,8,8", audio_size="1,128", num_channels=16,
        num_res_blocks=1, cross_attention_resolutions="2",
        cross_attention_windows="1", cross_attention_shift=True,
        video_attention_resolutions="-1", audio_attention_resolutions="-1",
        channel_mult="1,2", num_heads=2, dtype="float32",
    )
    model = MultimodalUNet(cfg)
    diffusion = create_gaussian_diffusion(steps=50)
    data = load_synthetic_data(2, video_size=(2, 3, 8, 8), audio_size=(1, 128))
    loop = TrainLoop(
        model=model, diffusion=diffusion, data=data, batch_size=2,
        output_dir=str(tmp_path), save_preview=True, preview_samples=2,
        sample_fn="dpm_solver++",
    )
    loop.sample_preview(step=1)
    previews = os.listdir(str(tmp_path / "previews"))
    assert any(p.endswith((".mp4", ".gif")) for p in previews)
    assert any(p.endswith(".wav") for p in previews)


def test_image_sr_degradations(tmp_path):
    import cv2

    from mm_diffusion_tpu.data.image import degrade_lr, load_sr_data

    # write a few images
    rng = np.random.RandomState(0)
    for i in range(3):
        img = (rng.rand(40, 52, 3) * 255).astype(np.uint8)
        cv2.imwrite(str(tmp_path / f"im{i}.png"), img)
    gen = load_sr_data(
        data_dir=str(tmp_path), batch_size=2, large_size=32, small_size=16
    )
    batch = next(gen)
    assert batch["high_res"].shape == (2, 32, 32, 3)
    assert batch["low_res"].shape == (2, 16, 16, 3)
    assert batch["sr_bicubic"].shape == (2, 32, 32, 3)
    for k, v in batch.items():
        assert v.min() >= -1.0 and v.max() <= 1.0

    import random

    hr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    lr = degrade_lr(hr, 16, random.Random(0))
    assert lr.shape == (16, 16, 3)


def test_parse_trace_on_cpu(tmp_path):
    """Trace capture + xplane parsing works end-to-end (CPU plane)."""
    from mm_diffusion_tpu.utils.profiling import parse_trace, trace

    @jax.jit
    def f(x):
        return jnp.tanh(x @ x).sum()

    x = jax.random.normal(jax.random.PRNGKey(0), (256, 256))
    _ = f(x).block_until_ready()
    with trace(str(tmp_path)):
        _ = f(x).block_until_ready()
    rows = parse_trace(str(tmp_path), top_n=5)
    assert rows and all(len(r) == 3 for r in rows)


def test_compile_cache_purges_on_host_signature_mismatch(tmp_path):
    """A cache dir carried from another host (mismatched HOST_SIGNATURE) must
    be purged, not served — XLA:CPU AOT entries for a different
    microarchitecture execute with only a SIGILL warning (advisor r3)."""
    from mm_diffusion_tpu.utils import cache

    d = str(tmp_path / "compcache")
    cache.enable_compilation_cache(d)
    sig = tmp_path / "compcache" / "HOST_SIGNATURE"
    assert sig.read_text() == cache._cpu_flags()

    # poison: foreign signature + a stale entry
    sig.write_text("foreign-machine avx512-whatever")
    stale = tmp_path / "compcache" / "stale_entry.bin"
    stale.write_bytes(b"poisoned")
    cache.enable_compilation_cache(d)
    assert not stale.exists()
    assert sig.read_text() == cache._cpu_flags()

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
