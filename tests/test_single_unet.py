"""Single-modal video/audio diffusion: model forward, training through the
shared TrainLoop + SingleModalTask, sampler, and the CLI entry.

Parity target: the reference's single-modal ``train_util.TrainLoop`` flows —
``save_visual`` (train_util.py:399) and ``save_audio`` (train_util.py:485) —
which train plain video/audio models with attribute-dispatched previews.
"""

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.configs import create_gaussian_diffusion
from mm_diffusion_tpu.models.single_unet import SingleModalUNet, SingleUNetConfig



VIDEO_CFG = SingleUNetConfig(
    modality="video",
    video_size=(2, 3, 8, 8),
    model_channels=16,
    out_channels=3,
    num_res_blocks=1,
    attention_resolutions=(2,),
    channel_mult=(1, 2),
    num_heads=2,
    dtype="float32",
)

AUDIO_CFG = SingleUNetConfig(
    modality="audio",
    audio_size=(1, 256),
    model_channels=16,
    out_channels=1,
    num_res_blocks=1,
    attention_resolutions=(4,),
    channel_mult=(1, 2, 2),
    num_heads=2,
    dtype="float32",
)


@pytest.fixture(scope="module", params=["video", "audio"])
def env(request):
    cfg = VIDEO_CFG if request.param == "video" else AUDIO_CFG
    model = SingleModalUNet(cfg)
    x = jnp.zeros((2,) + cfg.sample_shape)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((2,), jnp.int32)
    )
    return cfg, model, variables["params"]


def test_forward_shape(env):
    cfg, model, params = env
    x = jax.random.normal(jax.random.PRNGKey(1), (2,) + cfg.sample_shape)
    out = model.apply({"params": params}, x, jnp.array([0, 5]))
    assert out.shape == (2,) + cfg.sample_shape[:-1] + (cfg.out_channels,)
    assert np.all(np.isfinite(np.asarray(out)))


def test_learn_sigma_channels():
    import dataclasses

    cfg = dataclasses.replace(VIDEO_CFG, out_channels=6)
    model = SingleModalUNet(cfg)
    x = jnp.zeros((1,) + cfg.sample_shape)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, jnp.zeros((1,), jnp.int32)
    )
    out = model.apply({"params": variables["params"]}, x, jnp.zeros((1,), jnp.int32))
    assert out.shape[-1] == 6


def test_single_modal_train_and_preview(env, tmp_path):
    """TrainLoop + SingleModalTask end-to-end: loss decreases, preview media
    written (save_visual/save_audio parity)."""
    from mm_diffusion_tpu.train import TrainLoop
    from mm_diffusion_tpu.train.tasks import SingleModalTask

    cfg, model, params = env
    diffusion = create_gaussian_diffusion(steps=50)
    rng = np.random.RandomState(0)

    def data():
        while True:
            yield {"x": rng.uniform(-1, 1, (8,) + cfg.sample_shape).astype(np.float32)}

    loop = TrainLoop(
        model=model,
        diffusion=diffusion,
        data=data(),
        batch_size=8,
        lr=1e-3,
        log_interval=2,
        save_interval=1000,
        output_dir=str(tmp_path),
        save_preview=False,
        preview_samples=2,
        init_params=jax.tree.map(jnp.copy, params),
        task=SingleModalTask(sample_fn="ddim", preview_steps=3),
    )
    loop.run_loop(max_steps=3)
    assert int(jax.device_get(loop.state.step)) == 3
    loop.sample_preview(3)
    if cfg.modality == "video":
        assert glob.glob(str(tmp_path / "previews" / "step_000003_grid.mp4"))
    else:
        assert glob.glob(str(tmp_path / "previews" / "step_000003_*.wav"))


def test_build_single_sampler_dpm(env):
    """dpm_solver path of build_single_sampler (save_visual's 50-step order-2
    multistep dispatch, train_util.py:431-438) at tiny steps."""
    from mm_diffusion_tpu.sampling import build_single_sampler

    cfg, model, params = env
    diffusion = create_gaussian_diffusion(steps=50)
    sample = jax.jit(
        build_single_sampler(model, diffusion, params, "dpm_solver", steps=3),
        static_argnums=(1,),
    )
    out = sample(jax.random.PRNGKey(0), 2)
    assert out.shape == (2,) + cfg.sample_shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_single_modal_train_cli(tmp_path):
    from mm_diffusion_tpu.scripts import single_modal_train

    single_modal_train.main(
        [
            "--modality", "audio",
            "--video_size", "2,3,8,8",
            "--audio_size", "1,256",
            "--num_channels", "16",
            "--num_res_blocks", "1",
            "--attention_resolutions", "4",
            "--channel_mult", "1,2,2",
            "--num_heads", "2",
            "--data_dir", "synthetic",
            "--output_dir", str(tmp_path),
            "--batch_size", "8",
            "--log_interval", "2",
            "--save_interval", "100",
            "--max_steps", "3",
            "--num_workers", "0",
        ]
    )
    assert os.path.isdir(str(tmp_path / "checkpoints" / "3"))
    prog = (tmp_path / "progress.jsonl").read_text().strip().splitlines()
    rec = json.loads(prog[-1])
    assert "loss" in rec and np.isfinite(rec["loss"])

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
