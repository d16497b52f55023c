"""End-to-end training tests on the virtual 8-device CPU mesh.

Covers SURVEY §4's gap: the reference has no way to test multi-device
training without a cluster; here the full SPMD train step (sharded batch,
psum'd grads, EMA, loss-aware sampler) runs on 8 virtual devices.

Compile cost on CPU dominates, so the module shares one model / one jitted
step across tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.configs import create_gaussian_diffusion, create_model_config
from mm_diffusion_tpu.data import load_synthetic_data
from mm_diffusion_tpu.models.mm_unet import MultimodalUNet
from mm_diffusion_tpu.parallel import make_mesh, replicated, shard_batch
from mm_diffusion_tpu.train import (
    LossSecondMomentResampler,
    TrainLoop,
    checkpoint as ckpt_lib,
    create_train_state,
    make_optimizer,
    make_train_step,
)

VIDEO_SIZE = (2, 3, 8, 8)
AUDIO_SIZE = (1, 128)


@pytest.fixture(scope="module")
def env():
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
        dropout=0.0,
        dtype="float32",
    )
    model = MultimodalUNet(cfg)
    diffusion = create_gaussian_diffusion(steps=100)
    k = jax.random.PRNGKey(0)
    f, c, h, w = VIDEO_SIZE
    ca, l = AUDIO_SIZE
    variables = model.init(
        {"params": k, "shift": k},
        jnp.zeros((1, f, h, w, c)),
        jnp.zeros((1, l, ca)),
        jnp.zeros((1,), jnp.int32),
    )
    tx = make_optimizer(3e-4)
    step = jax.jit(make_train_step(model, diffusion, tx))
    return model, diffusion, tx, variables["params"], step


def make_batch(b=8):
    gen = load_synthetic_data(b, video_size=VIDEO_SIZE, audio_size=AUDIO_SIZE)
    return next(gen)


def test_train_step_runs_and_loss_decreases(env):
    model, diffusion, tx, params, step = env
    batch = make_batch(8)
    state = create_train_state(params, tx, ema_rates=(0.5,), num_timesteps=100)
    losses = []
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert int(state.step) == 10
    assert "loss_q0" in metrics and "grad_norm" in metrics
    # EMA at rate 0.5 should sit between init and current params
    p0 = jax.tree_util.tree_leaves(params)[-1]
    pn = jax.tree_util.tree_leaves(state.params)[-1]
    pe = jax.tree_util.tree_leaves(state.ema["0.5"])[-1]
    assert not np.allclose(np.asarray(pe), np.asarray(pn))


@pytest.mark.slow
def test_train_step_on_8_device_mesh(env):
    model, diffusion, tx, params, step = env
    mesh = make_mesh()
    assert mesh.devices.size == 8
    state = create_train_state(params, tx, num_timesteps=100)
    state = jax.device_put(state, replicated(mesh))
    sharded = shard_batch(make_batch(8), mesh)
    assert len(sharded["video"].sharding.device_set) == 8
    state, metrics = step(state, sharded, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # replicated and sharded execution agree (same rng, same data)
    state2 = create_train_state(params, tx, num_timesteps=100)
    _, metrics2 = step(state2, make_batch(8), jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics2["loss"]), rtol=1e-4
    )


@pytest.mark.slow
def test_checkpoint_roundtrip(env, tmp_path):
    model, diffusion, tx, params, step = env
    state = create_train_state(params, tx, num_timesteps=100)
    state, _ = step(state, make_batch(8), jax.random.PRNGKey(1))
    ckpt_dir = str(tmp_path / "ckpts")
    ckpt_lib.save_checkpoint(ckpt_dir, jax.device_get(state))
    assert ckpt_lib.latest_checkpoint_step(ckpt_dir) == 1
    fresh = create_train_state(params, tx, num_timesteps=100)
    restored = ckpt_lib.restore_checkpoint(ckpt_dir, fresh)
    assert int(restored.step) == 1
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_loss_aware_sampler_update_and_weights():
    s = LossSecondMomentResampler.create(num_timesteps=10, history=3)
    t = jnp.array([0, 0, 0, 5])
    losses = jnp.array([1.0, 2.0, 3.0, 4.0])
    s = s.update(t, losses)
    assert int(s.loss_counts[0]) == 3
    assert int(s.loss_counts[5]) == 1
    s = s.update(jnp.array([0]), jnp.array([9.0]))
    np.testing.assert_allclose(np.asarray(s.loss_history[0]), [2.0, 3.0, 9.0])
    w = s.weights()
    np.testing.assert_allclose(np.asarray(w), np.full(10, 0.1), rtol=1e-5)
    for ti in range(10):
        s = s.update(jnp.full((3,), ti), jnp.full((3,), float(ti + 1)))
    w = s.weights()
    assert float(w[9]) > float(w[0])
    t_s, wts = s.sample(jax.random.PRNGKey(0), 64)
    assert t_s.shape == (64,) and wts.shape == (64,)


@pytest.mark.slow
def test_trainloop_smoke(env, tmp_path):
    """One-save end-to-end loop (the reference's DIFFUSION_TRAINING_TEST
    escape hatch, multimodal_train_util.py:258-259, as a real test)."""
    model, diffusion, tx, params, step = env
    data = load_synthetic_data(8, video_size=VIDEO_SIZE, audio_size=AUDIO_SIZE)
    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=8,
        lr=1e-4,
        log_interval=2,
        save_interval=1000,
        output_dir=str(tmp_path),
        save_preview=False,
        init_params=jax.tree.map(jnp.copy, params),  # loop takes ownership
    )
    loop.run_loop(max_steps=3)
    assert int(jax.device_get(loop.state.step)) == 3
    assert ckpt_lib.latest_checkpoint_step(str(tmp_path / "checkpoints")) == 3


def test_trainloop_loader_death_surfaces(env, tmp_path):
    """A data iterator dying mid-training (decoder crash, missing audio
    source) must abort run_loop with the original error — the prefetch
    thread is daemonized, so a swallowed exception would otherwise hang the
    loop forever on an empty queue (VERDICT r4 #6 loader-death coverage)."""
    model, diffusion, tx, params, step = env

    def dying_data():
        gen = load_synthetic_data(8, video_size=VIDEO_SIZE, audio_size=AUDIO_SIZE)
        yield next(gen)
        raise IOError("no audio source for clip_7.mp4")

    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=dying_data(),
        batch_size=8,
        lr=1e-4,
        log_interval=2,
        save_interval=1000,
        output_dir=str(tmp_path),
        save_preview=False,
        init_params=jax.tree.map(jnp.copy, params),
    )
    with pytest.raises(IOError, match="no audio source"):
        loop.run_loop(max_steps=5)
    # the one good batch still trained before the loader died
    assert int(jax.device_get(loop.state.step)) >= 1


@pytest.mark.slow
def test_preview_sampling_sharded_over_mesh(env, tmp_path):
    """Preview sampling shards over the mesh when the preview batch divides
    it (train/loop.py sample_preview out_shardings) — on a multi-chip mesh
    the EMA preview costs 1/N of a replicated run. End-to-end through the
    media writers."""
    import glob

    model, diffusion, tx, params, step = env
    data = load_synthetic_data(8, video_size=VIDEO_SIZE, audio_size=AUDIO_SIZE)
    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=8,
        output_dir=str(tmp_path),
        save_preview=True,
        preview_samples=8,
        # TrainLoop takes ownership of init_params (its donated step deletes
        # them); the module-scoped fixture's copy must survive for later tests
        init_params=jax.tree.map(jnp.copy, params),
    )
    assert loop.mesh.size == 8
    loop.sample_preview(0)
    assert glob.glob(str(tmp_path / "previews" / "step_000000*"))
