"""End-to-end sampling pipeline tests: base sampler builders, the SR chain
with per-clip shared noise, and conditional builders (tiny models)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.configs import (
    create_gaussian_diffusion,
    create_image_sr_config,
    create_model_config,
)
from mm_diffusion_tpu.models.image_unet import ImageSuperResModel
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.sampling import (

    build_base_sampler,
    build_conditional_sampler,
    build_sr_sampler,
    sample_base_and_sr,
    shared_clip_noise,
)


@pytest.fixture(scope="module")
def base_env():
    cfg = create_model_config(
        video_size="2,3,8,8",
        audio_size="1,128",
        num_channels=16,
        num_res_blocks=1,
        cross_attention_resolutions="2",
        cross_attention_windows="1",
        cross_attention_shift=True,
        video_attention_resolutions="2",
        audio_attention_resolutions="-1",
        channel_mult="1,2",
        num_heads=2,
        dtype="float32",
    )
    model = MultimodalUNet(cfg)
    diffusion = create_gaussian_diffusion(steps=50)
    k = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": k, "shift": k},
        jnp.zeros((1, 2, 8, 8, 3)),
        jnp.zeros((1, 128, 1)),
        jnp.zeros((1,), jnp.int32),
    )
    return model, diffusion, variables["params"]


@pytest.fixture(scope="module")
def sr_env():
    cfg = create_image_sr_config(
        large_size=64, sr_num_channels=16, sr_num_res_blocks=1,
        sr_attention_resolutions="8", sr_learn_sigma=True, dtype="float32",
    )
    # shrink to a practical test size
    import dataclasses

    cfg = dataclasses.replace(cfg, image_size=16, channel_mult=(1, 2))
    model = ImageSuperResModel(cfg)
    diffusion = create_gaussian_diffusion(steps=50, learn_sigma=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 3)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, 8, 3)),
    )
    return model, diffusion, variables["params"]


@pytest.mark.parametrize("fn", ["dpm_solver", "dpm_solver++", "ddpm", "ddim"])
def test_base_sampler_variants(base_env, fn):
    model, diffusion, params = base_env
    sampler = build_base_sampler(model, diffusion, params, sample_fn=fn, steps=6)
    out = jax.jit(lambda r: sampler(r, 2))(jax.random.PRNGKey(1))
    assert out["video"].shape == (2, 2, 8, 8, 3)
    assert out["audio"].shape == (2, 128, 1)
    for k in out:
        assert np.all(np.isfinite(np.asarray(out[k])))


def test_shared_clip_noise_structure():
    x = shared_clip_noise(jax.random.PRNGKey(0), n_clips=2, frames=3, size=8)
    assert x.shape == (6, 8, 8, 3)
    # frames within a clip share noise; clips differ
    np.testing.assert_array_equal(np.asarray(x[0]), np.asarray(x[1]))
    np.testing.assert_array_equal(np.asarray(x[0]), np.asarray(x[2]))
    assert np.abs(np.asarray(x[0]) - np.asarray(x[3])).max() > 0.1


def test_full_base_plus_sr_pipeline(base_env, sr_env):
    model, diffusion, params = base_env
    sr_model, sr_diffusion, sr_params = sr_env
    base = build_base_sampler(model, diffusion, params, "dpm_solver++", steps=4)
    sr = build_sr_sampler(sr_model, sr_diffusion, sr_params, "ddim", steps=20)
    out = jax.jit(
        lambda r: sample_base_and_sr(base, sr, r, n=1, sr_size=16, frames=2)
    )(jax.random.PRNGKey(2))
    assert out["video"].shape == (1, 2, 8, 8, 3)
    assert out["sr_video"].shape == (1, 2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out["sr_video"])))


def test_sr_sampler_dpm_variant(sr_env):
    sr_model, _, sr_params = sr_env
    sr_diffusion = create_gaussian_diffusion(steps=50, learn_sigma=True)
    sr = build_sr_sampler(sr_model, sr_diffusion, sr_params, "dpm_solver++", steps=6)
    low = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))
    out = jax.jit(sr)(jax.random.PRNGKey(4), low)
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("cond_key,scale", [("audio", 0.0), ("video", 0.0), ("audio", 2.0)])
def test_conditional_sampler_builders(base_env, cond_key, scale):
    model, diffusion, params = base_env
    sampler = build_conditional_sampler(
        model, diffusion, params, condition_key=cond_key, class_scale=scale
    )
    cond_shape = (1, 128, 1) if cond_key == "audio" else (1, 2, 8, 8, 3)
    cond = jax.random.normal(jax.random.PRNGKey(5), cond_shape)
    out = jax.jit(sampler)(jax.random.PRNGKey(6), cond)
    assert out["video"].shape == (1, 2, 8, 8, 3)
    assert out["audio"].shape == (1, 128, 1)
    for k in out:
        assert np.all(np.isfinite(np.asarray(out[k])))

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
