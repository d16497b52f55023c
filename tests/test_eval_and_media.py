import numpy as np
import pytest

from mm_diffusion_tpu.data import media, synthetic_av_pair
from mm_diffusion_tpu.evaluation import (
    LogMelEmbedder,
    frechet_distance,
    polynomial_mmd,
    preprocess_videos_for_i3d,
)


def test_frechet_distance_zero_for_identical():
    rng = np.random.RandomState(0)
    x = rng.randn(256, 16)
    assert frechet_distance(x, x) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_detects_mean_shift():
    rng = np.random.RandomState(0)
    x = rng.randn(512, 8)
    y = rng.randn(512, 8) + 2.0
    d_shift = frechet_distance(x, y)
    y2 = rng.randn(512, 8)
    d_same = frechet_distance(x, y2)
    assert d_shift > d_same
    # mean term alone contributes ~ 8 * 2^2 = 32
    assert d_shift > 20


def test_frechet_matches_closed_form_gaussians():
    """For N(m1, s1 I) vs N(m2, s2 I): FD = |m1-m2|^2 + d*(s1+s2-2*sqrt(s1*s2))."""
    rng = np.random.RandomState(1)
    n, d = 20000, 4
    s1, s2 = 1.0, 4.0
    x = rng.randn(n, d) * np.sqrt(s1)
    y = rng.randn(n, d) * np.sqrt(s2) + 1.0
    expect = d * 1.0**2 + d * (s1 + s2 - 2 * np.sqrt(s1 * s2))
    got = frechet_distance(x, y)
    assert got == pytest.approx(expect, rel=0.1)


def test_polynomial_mmd_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(128, 8)
    y = rng.randn(128, 8)
    z = rng.randn(128, 8) * 3.0
    assert abs(polynomial_mmd(x, y)) < polynomial_mmd(x, z)


def test_sklearn_kernel_parity():
    sklearn = pytest.importorskip("sklearn.metrics.pairwise")
    from mm_diffusion_tpu.evaluation import polynomial_kernel

    rng = np.random.RandomState(0)
    x = rng.randn(16, 8)
    y = rng.randn(12, 8)
    np.testing.assert_allclose(
        polynomial_kernel(x, y), sklearn.polynomial_kernel(x, y), rtol=1e-10
    )


def test_preprocess_videos_shape():
    vids = np.random.randint(0, 255, (2, 4, 32, 48, 3), np.uint8)
    out = preprocess_videos_for_i3d(vids, resolution=16)
    assert out.shape == (2, 4, 16, 16, 3)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_logmel_embedder():
    emb = LogMelEmbedder(sample_rate=16000, n_mels=32)
    a = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    b = np.sin(np.linspace(0, 880 * 2 * np.pi, 16000)).astype(np.float32)
    ea = emb(np.stack([a, a]))
    eb = emb(np.stack([b, b]))
    assert ea.shape == (2, 128)
    # distinct pitches produce distinct embeddings
    assert np.abs(ea - eb).max() > 0.5
    np.testing.assert_allclose(ea[0], ea[1])


def test_media_roundtrip(tmp_path):
    pair = synthetic_av_pair(0, (4, 16, 16, 3), 1024)
    vpath = media.save_video(pair["video"], str(tmp_path / "v.mp4"), fps=4)
    assert vpath.endswith((".mp4", ".gif"))
    import os

    assert os.path.getsize(vpath) > 0
    media.save_audio(pair["audio"], str(tmp_path / "a.wav"))
    from mm_diffusion_tpu.data.video import read_wav

    audio, sr = read_wav(str(tmp_path / "a.wav"))
    assert sr == 16000
    np.testing.assert_allclose(audio[:, 0], pair["audio"][:, 0], atol=1e-3)
    v2, a2 = media.save_multimodal(pair["video"], pair["audio"], str(tmp_path / "mm"))
    assert os.path.exists(v2)
    # a2 is None when an ffmpeg binary muxed the audio into the container
    assert a2 is None or os.path.exists(a2)


def test_video_grid(tmp_path):
    vids = np.stack([synthetic_av_pair(i, (4, 8, 8, 3), 256)["video"] for i in range(3)])
    path = media.save_video_grid(vids, str(tmp_path / "grid.mp4"), fps=4)
    import os

    assert os.path.getsize(path) > 0


def test_synthetic_determinism():
    a = synthetic_av_pair(7, (4, 8, 8, 3), 256)
    b = synthetic_av_pair(7, (4, 8, 8, 3), 256)
    np.testing.assert_array_equal(a["video"], b["video"])
    np.testing.assert_array_equal(a["audio"], b["audio"])
    c = synthetic_av_pair(8, (4, 8, 8, 3), 256)
    assert np.abs(a["video"] - c["video"]).max() > 0.1
