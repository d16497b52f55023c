"""Exact-protocol C3D video Inception Score (evaluations/c3d/c3d_ft.py +
compute_video_is.py) — chainer-format npz weights, jax forward, TGAN IS.

The published conv3d_deepnetA_ucf.npz cannot be fetched here, so the tests
pin the machinery against independent oracles: the network forward against
a PyTorch reimplementation sharing the same raw weights (conv orientation,
cover_all/ceil pooling, chainer channel-major fc flatten), the
preprocessing against a per-element numpy rewrite, and the IS formula
against closed forms.
"""

import numpy as np
import pytest

from mm_diffusion_tpu.evaluation.c3d import (
    c3d_apply,
    calc_inception_tgan,
    load_c3d_mean,
    load_c3d_npz,
    preprocess_videos_c3d,
    video_inception_score_c3d,
)

# narrow-channel variant: same graph, fast on CPU (c3d_apply derives every
# size from the weights; only 128/112 preprocessing geometry is fixed)
_CH = {"conv1a": (3, 8), "conv2a": (8, 12), "conv3a": (12, 16), "conv3b": (16, 16),
       "conv4a": (16, 24), "conv4b": (24, 24), "conv5a": (24, 24), "conv5b": (24, 24)}
_FC = {"fc6": (24 * 1 * 4 * 4, 32), "fc7": (32, 32), "fc8": (32, 101)}


def _fake_weights(rng):
    raw = {}
    for name, (cin, cout) in _CH.items():
        raw[f"{name}/W"] = rng.standard_normal((cout, cin, 3, 3, 3)).astype(
            np.float32
        ) * 0.08
        raw[f"{name}/b"] = rng.standard_normal(cout).astype(np.float32) * 0.05
    for name, (cin, cout) in _FC.items():
        raw[f"{name}/W"] = rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        raw[f"{name}/b"] = rng.standard_normal(cout).astype(np.float32) * 0.05
    return raw


def _save_npz(path, raw, leading_slash=False):
    np.savez(path, **{("/" + k if leading_slash else k): v for k, v in raw.items()})


def _torch_forward(raw, x_nthwc):
    """Independent oracle: same weights through torch Conv3d/MaxPool3d
    (ceil_mode == chainer cover_all) with NCDHW layout and chainer's
    channel-major flatten."""
    torch = pytest.importorskip("torch")

    x = torch.from_numpy(np.transpose(x_nthwc, (0, 4, 1, 2, 3)).copy())

    def conv(name, h):
        w = torch.from_numpy(raw[f"{name}/W"])
        b = torch.from_numpy(raw[f"{name}/b"])
        return torch.nn.functional.conv3d(h, w, b, stride=1, padding=1)

    def pool(h, k):
        return torch.nn.functional.max_pool3d(h, k, stride=k, ceil_mode=True)

    with torch.no_grad():
        h = conv("conv1a", x).relu()
        h = pool(h, (1, 2, 2))
        h = conv("conv2a", h).relu()
        h = pool(h, (2, 2, 2))
        h = conv("conv3b", conv("conv3a", h).relu()).relu()
        h = pool(h, (2, 2, 2))
        h = conv("conv4b", conv("conv4a", h).relu()).relu()
        h = pool(h, (2, 2, 2))
        h = conv("conv5b", conv("conv5a", h).relu()).relu()
        h = pool(h, (2, 2, 2))
        h = h.reshape(h.shape[0], -1)  # NCDHW flatten == chainer order
        h = (h @ torch.from_numpy(raw["fc6/W"]).T + torch.from_numpy(raw["fc6/b"])).relu()
        h = (h @ torch.from_numpy(raw["fc7/W"]).T + torch.from_numpy(raw["fc7/b"])).relu()
        logits = h @ torch.from_numpy(raw["fc8/W"]).T + torch.from_numpy(raw["fc8/b"])
        return torch.softmax(logits, dim=-1).numpy()


def test_forward_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    raw = _fake_weights(rng)
    _save_npz(tmp_path / "c3d.npz", raw, leading_slash=True)  # chainer variant
    params = load_c3d_npz(str(tmp_path / "c3d.npz"))

    x = rng.standard_normal((2, 16, 112, 112, 3)).astype(np.float32)
    got = np.asarray(c3d_apply(params, x))
    ref = _torch_forward(raw, x)
    assert got.shape == (2, 101)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)


def test_cover_all_pooling_shape():
    """pool4's 7^2 must become pool5's 4^2 (ceil semantics) — the shape that
    makes fc6's 512*4*4 input work in the real network (c3d_ft.py:47)."""
    rng = np.random.default_rng(1)
    raw = _fake_weights(rng)
    params = load_c3d_npz_from_raw(raw)
    x = rng.standard_normal((1, 16, 112, 112, 3)).astype(np.float32)
    out = np.asarray(c3d_apply(params, x))
    assert out.shape == (1, 101)  # would fail in fc6 matmul if pooling drifted


def load_c3d_npz_from_raw(raw):
    import io

    buf = io.BytesIO()
    np.savez(buf, **raw)
    buf.seek(0)
    import tempfile, os

    with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as f:
        f.write(buf.read())
        path = f.name
    try:
        return load_c3d_npz(path)
    finally:
        os.unlink(path)


def test_preprocessing_matches_reference_recipe(tmp_path):
    """BGR reversal, mean subtraction, 8:120 crop — against an independent
    per-video numpy rewrite of compute_video_is.py:64-75."""
    import cv2

    rng = np.random.default_rng(2)
    mean_full = rng.standard_normal((3 * 1 * 16 * 128 * 171)).astype(np.float32)
    np.savez(tmp_path / "mean2.npz", mean=mean_full)
    mean = load_c3d_mean(str(tmp_path / "mean2.npz"))
    assert mean.shape == (3, 1, 16, 128, 128)

    videos = rng.integers(0, 255, (2, 16, 64, 80, 3)).astype(np.uint8)
    got = preprocess_videos_c3d(videos, mean)
    assert got.shape == (2, 16, 112, 112, 3)

    for n in range(2):
        for f in range(16):
            frame = cv2.resize(
                videos[n, f], (128, 128), interpolation=cv2.INTER_CUBIC
            ).astype(np.float32)
            for c_bgr, c_rgb in ((0, 2), (1, 1), (2, 0)):
                expected = frame[..., c_rgb] - mean[c_bgr, 0, f]
                np.testing.assert_allclose(
                    got[n, f, :, :, c_bgr],
                    expected[8:120, 8:120],
                    rtol=1e-5,
                    atol=1e-4,
                )


def test_short_clips_pad_by_repeating_last_frame(tmp_path):
    rng = np.random.default_rng(3)
    mean = np.zeros((3, 1, 16, 128, 128), np.float32)
    videos = rng.integers(0, 255, (1, 10, 128, 128, 3)).astype(np.uint8)
    got = preprocess_videos_c3d(videos, mean)
    assert got.shape == (1, 16, 112, 112, 3)
    np.testing.assert_array_equal(got[0, 10], got[0, 15])  # repeated tail


def test_is_formula_closed_forms():
    uniform = np.full((50, 101), 1 / 101.0)
    assert abs(calc_inception_tgan(uniform) - 1.0) < 1e-5
    peaked = np.eye(101)[np.arange(50) % 101] * 0.999 + 0.001 / 101
    peaked /= peaked.sum(-1, keepdims=True)
    assert calc_inception_tgan(peaked) > 10.0


def test_video_is_cli(tmp_path):
    """scripts/video_is.py end to end on an npz batch (compute_video_is.py
    CLI surface)."""
    import contextlib
    import io
    import json

    rng = np.random.default_rng(5)
    _save_npz(tmp_path / "c3d.npz", _fake_weights(rng))
    np.savez(
        tmp_path / "mean2.npz",
        mean=rng.standard_normal((3 * 16 * 128 * 171)).astype(np.float32),
    )
    np.savez(
        tmp_path / "samples.npz",
        arr_0=rng.integers(0, 255, (4, 16, 64, 64, 3)).astype(np.uint8),
    )

    from mm_diffusion_tpu.scripts.video_is import main

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(
            [
                str(tmp_path / "samples.npz"),
                "--c3d_npz", str(tmp_path / "c3d.npz"),
                "--mean", str(tmp_path / "mean2.npz"),
                "--batch_size", "2",
                "--output_dir", str(tmp_path / "out"),
            ]
        )
    result = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert result["protocol"] == "c3d_ucf101"
    assert result["clips"] == 4
    assert np.isfinite(result["video_is"]) and result["video_is"] >= 1.0 - 1e-6


def test_video_is_end_to_end(tmp_path):
    rng = np.random.default_rng(4)
    raw = _fake_weights(rng)
    _save_npz(tmp_path / "c3d.npz", raw)
    np.savez(
        tmp_path / "mean2.npz",
        mean=rng.standard_normal((3 * 16 * 128 * 171)).astype(np.float32) * 10,
    )
    videos = rng.integers(0, 255, (5, 16, 64, 64, 3)).astype(np.uint8)
    score = video_inception_score_c3d(
        videos,
        str(tmp_path / "c3d.npz"),
        str(tmp_path / "mean2.npz"),
        batch_size=2,
    )
    assert np.isfinite(score) and score >= 1.0 - 1e-6
