"""Shape/dtype property tests across the model config space (SURVEY §4e):
every supported config knob combination must build, run, and emit correctly
shaped finite outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.configs import create_model_config
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet


CONFIGS = {
    "learn_sigma_no_filmnorm": dict(
        learn_sigma=True, use_scale_shift_norm=False, cross_attention_shift=False
    ),
    "audio_self_attention_3level": dict(
        audio_attention_resolutions="2,4",
        channel_mult="1,2,2",
        audio_size="1,512",
        cross_attention_resolutions="2,4",
        cross_attention_windows="1,2",
    ),
    "conv3d_video_type": dict(video_type="3d", cross_attention_shift=True),
    "no_cross_attention": dict(
        cross_attention_resolutions="-1", cross_attention_windows="-1"
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_config_variant_forward(name):
    overrides = CONFIGS[name]
    base = dict(
        video_size="4,3,16,16",
        audio_size="1,256",
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
    base.update(overrides)
    cfg = create_model_config(**base)
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    v = jax.random.normal(jax.random.PRNGKey(0), (2, f, h, w, c))
    a = jax.random.normal(jax.random.PRNGKey(1), (2, l, ca))
    t = jnp.array([1, 5])
    rngs = {"params": jax.random.PRNGKey(2), "shift": jax.random.PRNGKey(3)}
    variables = model.init(rngs, v, a, t)
    vo, ao = model.apply(variables, v, a, t, rngs={"shift": jax.random.PRNGKey(4)})
    assert vo.shape == (2, f, h, w, cfg.video_out_channels)
    assert ao.shape == (2, l, cfg.audio_out_channels)
    assert np.all(np.isfinite(np.asarray(vo)))
    assert np.all(np.isfinite(np.asarray(ao)))


def test_num_head_channels_variant():
    cfg = create_model_config(
        video_size="4,3,16,16",
        audio_size="1,256",
        num_channels=32,
        num_res_blocks=1,
        cross_attention_resolutions="2",
        cross_attention_windows="1",
        cross_attention_shift=True,
        video_attention_resolutions="2",
        audio_attention_resolutions="-1",
        channel_mult="1,2",
        num_heads=4,
        num_head_channels=32,  # cross-attn heads = ch/32 (the shipped config style)
        dtype="float32",
    )
    from mm_diffusion_tpu.models.mm_unet import CrossAttnSpec, build_plan

    plan = build_plan(cfg)
    xs = [s for specs in plan.encoder for s in specs if isinstance(s, CrossAttnSpec)]
    assert xs and all(s.heads == s.ch // 32 for s in xs)

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
