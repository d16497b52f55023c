import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.models import (
    MMUNetConfig,
    MultimodalUNet,
    build_plan,
    window_frame_indices,
)
from mm_diffusion_tpu.models.mm_unet import CrossAttnSpec, ResBlockSpec


def tiny_config(**kw):
    base = dict(
        video_size=(4, 3, 16, 16),
        audio_size=(1, 1024),
        model_channels=32,
        video_out_channels=3,
        audio_out_channels=1,
        num_res_blocks=1,
        cross_attention_resolutions=(2, 4),
        cross_attention_windows=(1, 2),
        cross_attention_shift=True,
        video_attention_resolutions=(2, 4),
        audio_attention_resolutions=(-1,),
        channel_mult=(1, 2, 3),
        num_heads=2,
        num_head_channels=-1,
        use_scale_shift_norm=True,
        dtype="float32",
    )
    base.update(kw)
    return MMUNetConfig(**base)


def test_plan_structure_default_config():
    """Plan reproduces the reference's block/dilation bookkeeping for the
    shipped base config (multimodal_unet.py:799-1001)."""
    cfg = MMUNetConfig()
    plan = build_plan(cfg)
    # encoder: 1 initial + 4 levels x 2 resblocks + 3 downsamples = 12 blocks
    assert len(plan.encoder) == 12
    # decoder: 4 levels x 3 blocks
    assert len(plan.decoder) == 12
    # middle has cross-attention because windows == (1,4,8)
    assert any(isinstance(s, CrossAttnSpec) for s in plan.middle)
    mid_x = [s for s in plan.middle if isinstance(s, CrossAttnSpec)][0]
    assert mid_x.local_window == 16 and not mid_x.window_shift

    # encoder audio dilations: 2^1..2^9 then wrap to 2^0, 2^1 (d % 10)
    enc_res = [s for specs in plan.encoder for s in specs if isinstance(s, ResBlockSpec)]
    dils = [s.audio_dilation for s in enc_res]
    assert dils == [2, 4, 8, 16, 32, 64, 128, 256, 512, 1, 2]
    # middle both use 2^(12%10) = 4
    mid_res = [s for s in plan.middle if isinstance(s, ResBlockSpec)]
    assert [s.audio_dilation for s in mid_res] == [4, 4]
    # decoder starts at 2^(11%10) = 2 and decrements
    dec_res = [s for specs in plan.decoder for s in specs if isinstance(s, ResBlockSpec)]
    assert dec_res[0].audio_dilation == 2

def test_plan_cross_attention_placement():
    """Cross-attention appears at ds 2/4/8 with windows 1/4/8 respectively
    (multimodal_unet.py:832-843,:969-978)."""
    cfg = MMUNetConfig()
    plan = build_plan(cfg)
    enc_x = [s for specs in plan.encoder for s in specs if isinstance(s, CrossAttnSpec)]
    # level0 runs at ds=1 (no cross); levels 1..3 run at ds 2/4/8, two res
    # blocks each, each followed by a cross block with the matching window.
    assert [s.local_window for s in enc_x] == [1, 1, 4, 4, 8, 8]
    dec_x = [s for specs in plan.decoder for s in specs if isinstance(s, CrossAttnSpec)]
    assert [s.local_window for s in dec_x] == [8, 8, 8, 4, 4, 4, 1, 1, 1]
    # num_head_channels=-1 => heads == num_heads everywhere
    assert all(s.heads == cfg.num_heads for s in enc_x + dec_x)


def test_window_indices_wraparound():
    idx = np.asarray(window_frame_indices(4, 2, 3))
    assert idx.shape == (4, 2)
    np.testing.assert_array_equal(idx[0], [3, 0])
    np.testing.assert_array_equal(idx[3], [2, 3])


@pytest.mark.slow
def test_forward_shapes_and_dtypes():
    cfg = tiny_config()
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    b = 2
    video = jnp.zeros((b, f, h, w, c))
    audio = jnp.zeros((b, l, ca))
    t = jnp.array([0, 5])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shift": jax.random.PRNGKey(1)},
        video,
        audio,
        t,
    )
    v_out, a_out = model.apply(
        variables, video, audio, t, rngs={"shift": jax.random.PRNGKey(2)}
    )
    assert v_out.shape == (b, f, h, w, 3)
    assert a_out.shape == (b, l, 1)
    assert v_out.dtype == jnp.float32


@pytest.mark.slow
def test_zero_init_heads_give_zero_output():
    """Output convs are zero-initialized, so a fresh model predicts ~0
    (parity with the reference's zero_module head, multimodal_unet.py:1003-1012)."""
    cfg = tiny_config()
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    video = jax.random.normal(jax.random.PRNGKey(3), (1, f, h, w, c))
    audio = jax.random.normal(jax.random.PRNGKey(4), (1, l, ca))
    t = jnp.array([10])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shift": jax.random.PRNGKey(1)}, video, audio, t
    )
    v_out, a_out = model.apply(
        variables, video, audio, t, rngs={"shift": jax.random.PRNGKey(2)}
    )
    assert float(jnp.abs(v_out).max()) == 0.0
    assert float(jnp.abs(a_out).max()) == 0.0


def test_learn_sigma_output_channels():
    cfg = tiny_config(video_out_channels=6, audio_out_channels=2)
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    video = jnp.zeros((1, f, h, w, c))
    audio = jnp.zeros((1, l, ca))
    t = jnp.array([0])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "shift": jax.random.PRNGKey(1)}, video, audio, t
    )
    v_out, a_out = model.apply(
        variables, video, audio, t, rngs={"shift": jax.random.PRNGKey(2)}
    )
    assert v_out.shape[-1] == 6 and a_out.shape[-1] == 2


@pytest.mark.slow
def test_forward_jits_and_is_deterministic_without_shift_rng():
    cfg = tiny_config(cross_attention_shift=False)
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    video = jax.random.normal(jax.random.PRNGKey(0), (1, f, h, w, c))
    audio = jax.random.normal(jax.random.PRNGKey(1), (1, l, ca))
    t = jnp.array([3])
    variables = model.init({"params": jax.random.PRNGKey(0)}, video, audio, t)

    @jax.jit
    def fwd(v, a, tt):
        return model.apply(variables, v, a, tt)

    o1 = fwd(video, audio, t)
    o2 = fwd(video, audio, t)
    np.testing.assert_allclose(np.asarray(o1[0]), np.asarray(o2[0]))


@pytest.mark.slow
def test_train_and_eval_paths_agree_without_dropout():
    """The eval-only graph rewrites (deferred up-block upsample, stock-GN
    formulation) and the train-only ones (channel-sum GN under remat, saved
    attention qkv) are exact algebraic rewrites of the same function — with
    dropout off the two paths must produce the same values.

    Guards the MMResBlock defer_up commute (upsample past GN/FiLM/SiLU/1x1
    convs/residual) and the GroupNormFP32 formulation switch at once."""
    cfg = tiny_config(
        cross_attention_shift=False,
        resblock_updown=True,
        use_checkpoint=True,
        dropout=0.0,
    )
    model = MultimodalUNet(cfg)
    f, c, h, w = cfg.video_size
    ca, l = cfg.audio_size
    video = jax.random.normal(jax.random.PRNGKey(0), (2, f, h, w, c))
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, l, ca))
    t = jnp.array([3, 250])
    variables = model.init({"params": jax.random.PRNGKey(0)}, video, audio, t)

    ev_v, ev_a = model.apply(variables, video, audio, t, train=False)
    tr_v, tr_a = model.apply(
        variables, video, audio, t, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(np.asarray(ev_v), np.asarray(tr_v), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ev_a), np.asarray(tr_a), atol=1e-4, rtol=1e-4)
