"""CLI entry-point smoke tests: every script runs end-to-end with tiny flags
on the CPU mesh (random weights / synthetic data), producing real outputs.

These exercise the exact flag-parsing surface a reference user would hit.
"""

import glob
import json
import os

import numpy as np
import pytest


TINY_MM = [
    "--video_size", "2,3,8,8",
    "--audio_size", "1,128",
    "--num_channels", "16",
    "--num_res_blocks", "1",
    "--cross_attention_resolutions", "2",
    "--cross_attention_windows", "1",
    "--cross_attention_shift", "True",
    "--video_attention_resolutions", "2",
    "--audio_attention_resolutions", "-1",
    "--channel_mult", "1,2",
    "--num_heads", "2",
    "--use_fp16", "False",
]

TINY_SR = [
    "--large_size", "64",
    "--small_size", "8",
    "--sr_num_channels", "16",
    "--sr_num_res_blocks", "1",
    "--sr_attention_resolutions", "8",
]


def test_multimodal_train_cli(tmp_path):
    from mm_diffusion_tpu.scripts import multimodal_train

    multimodal_train.main(
        TINY_MM
        + [
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


def test_multimodal_sample_sr_cli(tmp_path):
    from mm_diffusion_tpu.scripts import multimodal_sample_sr

    multimodal_sample_sr.main(
        TINY_MM
        + TINY_SR
        + [
            "--multimodal_model_path", "random",
            "--sr_model_path", "random",
            "--output_dir", str(tmp_path),
            "--batch_size", "1",
            "--sample_num", "1",
            "--sample_fn", "dpm_solver++",
            "--sample_steps", "4",
            "--sr_sample_fn", "ddim",
            "--sr_sample_steps", "5",
        ]
    )
    wavs = glob.glob(str(tmp_path / "sample_*.wav"))
    vids = glob.glob(str(tmp_path / "sample_*.mp4")) + glob.glob(
        str(tmp_path / "sample_*.gif")
    )
    assert wavs and vids


def test_video2audio_cli(tmp_path):
    from mm_diffusion_tpu.scripts import video2audio_sample

    video2audio_sample.main(
        TINY_MM
        + TINY_SR
        + [
            "--data_dir", "synthetic",
            "--multimodal_model_path", "random",
            "--output_dir", str(tmp_path),
            "--batch_size", "1",
            "--sample_num", "1",
            "--classifier_scale", "0.0",
            "--diffusion_steps", "50",
        ]
    )
    assert glob.glob(str(tmp_path / "v2a_*"))


def test_image_sr_train_cli(tmp_path):
    from mm_diffusion_tpu.scripts import image_sr_train

    image_sr_train.main(
        [
            "--data_dir", "synthetic",
            "--output_dir", str(tmp_path),
            "--large_size", "64",
            "--small_size", "16",
            "--sr_num_channels", "16",
            "--sr_num_res_blocks", "1",
            "--sr_attention_resolutions", "8",
            "--batch_size", "8",
            "--log_interval", "2",
            "--save_interval", "100",
            "--max_steps", "2",
        ]
    )
    assert os.path.isdir(str(tmp_path / "checkpoints"))


def test_eval_cli(tmp_path):
    """End-to-end eval over two sample directories (pixel/log-mel fallback
    embedders; directory loader reads the mp4+wav pairs we write)."""
    from mm_diffusion_tpu.data import media, synthetic_av_pair
    from mm_diffusion_tpu.scripts import eval as eval_script

    for d, seed in (("real", 0), ("fake", 50)):
        os.makedirs(tmp_path / d, exist_ok=True)
        for i in range(4):
            pair = synthetic_av_pair(seed + i, (16, 32, 32, 3), 70560)
            media.save_multimodal(
                pair["video"], pair["audio"], str(tmp_path / d / f"s{i:02d}"),
                fps=10, audio_rate=44100,
            )
    import io
    from contextlib import redirect_stdout

    # without pretrained embedders, a run must be explicitly opted into
    # fallback mode (VERDICT r1 weak #4 guardrail)
    with pytest.raises(RuntimeError, match="fallback"):
        eval_script.main(
            [
                "--ref_dir", str(tmp_path / "real"),
                "--fake_dir", str(tmp_path / "fake"),
                "--output_dir", str(tmp_path / "out"),
                "--sample_num", "4",
                "--batch_size", "2",
            ]
        )

    buf = io.StringIO()
    with redirect_stdout(buf):
        eval_script.main(
            [
                "--ref_dir", str(tmp_path / "real"),
                "--fake_dir", str(tmp_path / "fake"),
                "--output_dir", str(tmp_path / "out"),
                "--sample_num", "4",
                "--batch_size", "2",
                "--allow_fallback",
            ]
        )
    metrics = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert {"fvd", "kvd", "fad"} <= set(metrics)
    assert metrics["protocol"] == "fallback"
    assert metrics["video_embedder"] == "pixel_fallback"
    assert metrics["audio_embedder"] == "logmel_fallback"
    for k in ("fvd", "kvd", "fad"):
        assert np.isfinite(metrics[k])


def test_audio2video_cli(tmp_path):
    from mm_diffusion_tpu.scripts import audio2video_sample_sr

    audio2video_sample_sr.main(
        TINY_MM
        + TINY_SR
        + [
            "--data_dir", "synthetic",
            "--multimodal_model_path", "random",
            "--sr_model_path", "",  # skip the SR chain in the smoke test
            "--output_dir", str(tmp_path),
            "--batch_size", "1",
            "--sample_num", "1",
            "--classifier_scale", "0.0",
            "--diffusion_steps", "50",
        ]
    )
    assert glob.glob(str(tmp_path / "a2v_*"))


def test_sr_preview_triptych(tmp_path):
    """ImageSRTask.preview writes the bicubic|sample|hr triptych (parity:
    save_sr, train_util.py:566-671) from a minimal loop facade."""
    import types

    import jax
    import jax.numpy as jnp

    from mm_diffusion_tpu.configs import create_image_sr_config
    from mm_diffusion_tpu.models.image_unet import ImageSuperResModel
    from mm_diffusion_tpu.scripts.image_sr_train import synthetic_sr_data
    from mm_diffusion_tpu.train.tasks import ImageSRTask

    import dataclasses

    cfg = create_image_sr_config(
        large_size=64, sr_num_channels=16, sr_num_res_blocks=1,
        sr_attention_resolutions="8", sr_learn_sigma=True, dtype="float32",
    )
    cfg = dataclasses.replace(cfg, image_size=16, channel_mult=(1, 2))
    model = ImageSuperResModel(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,), jnp.int32), jnp.zeros((1, 8, 8, 3)),
    )
    loop = types.SimpleNamespace(
        model=model,
        diffusion=types.SimpleNamespace(num_timesteps=50),
        state=types.SimpleNamespace(ema={"0.9999": variables["params"]}),
        last_batch=next(synthetic_sr_data(4, 16, 8)),
        rng=jax.random.PRNGKey(0),
        output_dir=str(tmp_path),
    )
    ImageSRTask(16, 8, preview_steps=5).preview(loop, step=7)
    out = str(tmp_path / "previews" / "step_000007.png")
    assert os.path.getsize(out) > 0


def test_multimodal_sample_sr_cli_data_sharded(tmp_path):
    """--n_sample_data shards the sampling batch over the 8-device CPU mesh
    (the reference's per-GPU sampling ranks, multimodal_sample_sr.sh
    mpiexec); jax.random is sharding-invariant so the media outputs must be
    identical to the single-device run."""
    from mm_diffusion_tpu.scripts import multimodal_sample_sr

    common = (
        TINY_MM
        + TINY_SR
        + [
            "--multimodal_model_path", "random",
            "--sr_model_path", "random",
            "--batch_size", "8",
            "--sample_num", "8",
            "--sample_fn", "ddpm",
            "--sample_steps", "3",
            "--timestep_respacing", "3",
            "--sr_sample_fn", "ddim",
            "--sr_sample_steps", "2",
            "--save_type", "gif",
        ]
    )
    single = tmp_path / "single"
    sharded = tmp_path / "sharded"
    multimodal_sample_sr.main(common + ["--output_dir", str(single)])
    multimodal_sample_sr.main(
        common + ["--output_dir", str(sharded), "--n_sample_data", "8"]
    )
    s_wavs = sorted(glob.glob(str(single / "sample_*.wav")))
    p_wavs = sorted(glob.glob(str(sharded / "sample_*.wav")))
    assert len(s_wavs) == len(p_wavs) == 8
    for a, b in zip(s_wavs, p_wavs):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), f"{a} != {b}"

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
