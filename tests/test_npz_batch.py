"""OpenAI-style .npz AV batch workflow (evaluation/npz_batch.py): the batch
file contract of the reference's TF1 evaluator (evaluations/evaluator.py:
27-60, ``ref_batch sample_batch`` npz positional args) extended to AV pairs,
consumed by eval_multimodal and scripts/image_eval.py without a media
detour."""

import os

import numpy as np
import pytest

from mm_diffusion_tpu.evaluation.npz_batch import (
    is_npz_batch,
    load_av_npz_batch,
    npz_av_loader,
    npz_batch_len,
    save_av_npz_batch,
)


def _fake_batch(n=3, f=8, hw=32, l=1600, seed=0):
    rng = np.random.default_rng(seed)
    videos = rng.uniform(-1, 1, (n, f, hw, hw, 3)).astype(np.float32)
    audios = rng.uniform(-0.5, 0.5, (n, l)).astype(np.float32)
    return videos, audios


def test_roundtrip(tmp_path):
    videos, audios = _fake_batch()
    path = save_av_npz_batch(
        str(tmp_path / "batch"), videos, audios, video_fps=8, audio_fps=1600
    )
    assert is_npz_batch(path) and path.endswith(".npz")
    v, a, vfps, afps = load_av_npz_batch(path)
    assert v.dtype == np.uint8 and v.shape == videos.shape
    np.testing.assert_array_equal(
        v, ((videos + 1) * 127.5).clip(0, 255).astype(np.uint8)
    )
    assert a.shape == (3, 1600, 1)
    assert (vfps, afps) == (8.0, 1600)
    assert npz_batch_len(path) == 3


def test_extra_arrays_and_uint8_passthrough(tmp_path):
    videos, audios = _fake_batch()
    v8 = ((videos + 1) * 127.5).astype(np.uint8)
    base = np.zeros((3, 8, 8, 8, 3), np.float32)
    path = save_av_npz_batch(
        str(tmp_path / "b.npz"), v8, audios, extra_arrays={"video_base": base}
    )
    with np.load(path) as z:
        assert z["arr_0"].dtype == np.uint8
        assert z["video_base"].shape == base.shape


def test_loader_protocol_shapes(tmp_path):
    """The npz loader matches the directory loader's contract: protocol-size
    video in [-1, 1], protocol-rate audio, infinite looping over a short
    batch."""
    videos, audios = _fake_batch(n=3, f=8, hw=32, l=1600)
    path = save_av_npz_batch(
        str(tmp_path / "b"), videos, audios, video_fps=8, audio_fps=1000
    )
    it = npz_av_loader(
        path, batch_size=2, video_size=(16, 3, 64, 64), audio_size=(1, 4410),
        audio_fps=2000,
    )
    b1 = next(it)
    assert b1["video"].shape == (2, 16, 64, 64, 3)
    assert b1["video"].min() >= -1.0 and b1["video"].max() <= 1.0
    # stored f=8 < protocol 16: last frame repeats
    np.testing.assert_array_equal(b1["video"][:, 8], b1["video"][:, 15])
    assert b1["audio"].shape == (2, 4410, 1)
    # audio was resampled 1000 -> 2000 Hz: 1600 samples -> 3200 nonzero
    assert np.abs(b1["audio"][0, 3100:3190]).max() > 0
    assert np.abs(b1["audio"][0, 3300:]).max() == 0
    # looping: items 0,1 / 2,0 / 1,2 — batch 2's second item == batch 1's first
    b2 = next(it)
    b3 = next(it)
    np.testing.assert_array_equal(b2["video"][1], b1["video"][0])
    np.testing.assert_array_equal(b3["video"][1], b2["video"][0])


def test_video_only_batch_gets_silent_audio(tmp_path):
    videos, _ = _fake_batch()
    v8 = ((videos + 1) * 127.5).astype(np.uint8)
    np.savez(str(tmp_path / "v.npz"), arr_0=v8)
    v, a, _, _ = load_av_npz_batch(str(tmp_path / "v.npz"))
    assert v.shape == videos.shape
    assert a.shape[0] == 3 and float(np.abs(a).max()) == 0.0


def test_eval_multimodal_accepts_npz(tmp_path):
    """eval_multimodal over npz batches: identical batches -> FVD ~ 0; a
    shifted fake batch -> strictly larger FVD (fallback embedders)."""
    from mm_diffusion_tpu.evaluation.evaluator import eval_multimodal

    videos, audios = _fake_batch(n=4, f=16, hw=32, l=70560)
    real = save_av_npz_batch(
        str(tmp_path / "real"), videos, audios, video_fps=10, audio_fps=44100
    )
    same = eval_multimodal(real, real, eval_num=4, batch_size=2, allow_fallback=True)
    assert same["fvd"] < 1e-6 and abs(same["fad"]) < 1e-3
    shifted = save_av_npz_batch(
        str(tmp_path / "fake"),
        (videos * 0.3 + 0.5).clip(-1, 1),
        audios * 0.1,
        video_fps=10,
        audio_fps=44100,
    )
    diff = eval_multimodal(real, shifted, eval_num=4, batch_size=2, allow_fallback=True)
    assert diff["fvd"] > same["fvd"]
    assert diff["protocol"] == "fallback"


def test_eval_multimodal_mixed_dir_and_npz(tmp_path):
    """A directory reference against an npz sample batch — the production
    eval shape after `--save_type npz` sampling."""
    from mm_diffusion_tpu.data import media
    from mm_diffusion_tpu.evaluation.evaluator import eval_multimodal

    videos, audios = _fake_batch(n=2, f=16, hw=32, l=70560)
    d = tmp_path / "real"
    os.makedirs(d)
    for i in range(2):
        media.save_multimodal(
            videos[i], audios[i][:, None], str(d / f"c{i}"), fps=10,
            audio_rate=44100,
        )
    fake = save_av_npz_batch(
        str(tmp_path / "fake"), videos, audios, video_fps=10, audio_fps=44100
    )
    out = eval_multimodal(str(d), fake, eval_num=2, batch_size=2, allow_fallback=True)
    assert np.isfinite(out["fvd"]) and np.isfinite(out["fad"])


def test_image_eval_flattens_video_batches(tmp_path):
    from mm_diffusion_tpu.evaluation.image_eval import load_image_batch

    videos, audios = _fake_batch(n=2, f=4, hw=16)
    path = save_av_npz_batch(str(tmp_path / "b"), videos, audios)
    arr = load_image_batch(path)
    assert arr.shape == (8, 16, 16, 3) and arr.dtype == np.uint8


@pytest.mark.slow
def test_sample_sr_cli_npz(tmp_path):
    """--save_type npz end to end: the sampling CLI writes one batch file
    the evaluator accepts (instead of per-sample media)."""
    from tests.test_scripts_cli import TINY_MM, TINY_SR

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
            "--sample_fn", "ddim",
            "--sample_steps", "2",
            "--sr_sample_fn", "ddim",
            "--sr_sample_steps", "2",
            "--save_type", "npz",
        ]
    )
    import glob

    batches = glob.glob(str(tmp_path / "*_samples_*.npz"))
    assert len(batches) == 1
    v, a, _, _ = load_av_npz_batch(batches[0])
    assert v.ndim == 5 and v.shape[0] == 1 and a.shape[0] == 1
    with np.load(batches[0]) as z:
        assert "video_base" in z
