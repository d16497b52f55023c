"""Image-set evaluation: metric math + npz/dir loaders + CLI.

Covers the substitute for `evaluations/compute_image_is.py` (TF1 npz
evaluator): FID/KID reuse the closed-form-tested video math; improved
precision/recall is validated on known geometry; the CLI runs end-to-end on
synthetic batches with the pixel fallback.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from mm_diffusion_tpu.evaluation.image_eval import eval_images, load_image_batch
from mm_diffusion_tpu.evaluation.metrics import manifold_radii, precision_recall


def test_precision_recall_identical_sets():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(128, 16))
    p, r = precision_recall(a, a + 1e-4 * rng.normal(size=a.shape))
    assert p > 0.95 and r > 0.95


def test_precision_recall_disjoint_sets():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(128, 16))
    p, r = precision_recall(a, a + 100.0)
    assert p == 0.0 and r == 0.0


def test_precision_recall_mode_collapse_asymmetry():
    # samples collapsed onto one ref mode: precision high (every sample is
    # near real data), recall low (most refs uncovered) — the property the
    # metric exists to expose (compute_image_is.py:195-204)
    rng = np.random.default_rng(2)
    ref = np.concatenate(
        [rng.normal(0, 0.1, size=(64, 8)), rng.normal(10, 0.1, size=(64, 8))]
    )
    sample = rng.normal(0, 0.1, size=(128, 8))
    p, r = precision_recall(ref, sample)
    assert p > 0.8
    assert r < 0.6


def test_manifold_radii_matches_bruteforce():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(40, 4))
    d = ((x[:, None] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    expect = np.sort(d, axis=1)[:, 2]  # k=3
    np.testing.assert_allclose(manifold_radii(x, k=3), expect, rtol=1e-10)


def _write_npz(path, imgs):
    np.savez(path, arr_0=imgs)
    return str(path)


def test_load_image_batch_npz_and_dir(tmp_path):
    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 256, size=(6, 32, 32, 3), dtype=np.uint8)
    npz = _write_npz(tmp_path / "batch.npz", imgs)
    got = load_image_batch(npz)
    np.testing.assert_array_equal(got, imgs)
    assert load_image_batch(npz, limit=3).shape[0] == 3

    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    for i, im in enumerate(imgs):
        Image.fromarray(im).save(d / f"{i:03d}.png")
    got_dir = load_image_batch(str(d))
    np.testing.assert_array_equal(got_dir, imgs)


def test_eval_images_fallback_same_vs_shifted(tmp_path):
    rng = np.random.default_rng(5)
    base = rng.integers(40, 200, size=(48, 16, 16, 3), dtype=np.uint8)
    near = np.clip(base.astype(np.int32) + rng.integers(-2, 3, base.shape), 0, 255).astype(np.uint8)
    far = np.clip(base.astype(np.int32) + 55, 0, 255).astype(np.uint8)
    ref = _write_npz(tmp_path / "ref.npz", base)
    near_p = _write_npz(tmp_path / "near.npz", near)
    far_p = _write_npz(tmp_path / "far.npz", far)

    m_near = eval_images(ref, near_p, allow_fallback=True)
    m_far = eval_images(ref, far_p, allow_fallback=True)
    assert m_near["protocol"] == "fallback"
    assert m_near["fid"] < m_far["fid"]
    assert m_near["kid"] < m_far["kid"]
    assert m_near["precision"] > m_far["precision"]
    assert m_near["recall"] > m_far["recall"]


def test_eval_images_refuses_fallback_without_flag(tmp_path):
    imgs = np.zeros((4, 8, 8, 3), np.uint8)
    p = _write_npz(tmp_path / "b.npz", imgs)
    with pytest.raises(RuntimeError, match="NOT a perceptual"):
        eval_images(p, p, allow_fallback=False)


def test_image_eval_cli(tmp_path):
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, size=(24, 16, 16, 3), dtype=np.uint8)
    ref = _write_npz(tmp_path / "ref.npz", imgs)
    sam = _write_npz(tmp_path / "sam.npz", imgs.copy())
    out = subprocess.run(
        [sys.executable, "-m", "mm_diffusion_tpu.scripts.image_eval",
         ref, sam, "--allow_fallback", "--output_dir", str(tmp_path / "o")],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    metrics = json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["fid"] < 1e-6
    assert metrics["precision"] == 1.0 and metrics["recall"] == 1.0
    assert metrics["image_embedder"] == "pixel_fallback"
