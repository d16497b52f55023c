"""Tests for the flax ESResNeXt-FBSP audio tower (FAD embedder).

The vendored reference model cannot run here (torchvision is absent), so the
front end is validated against closed-form mathematics: with m=0, fb=1,
fc=arange the FBSP filterbank reduces exactly to the (normalized) Fourier
basis, so the spectrogram must match numpy's rFFT of the framed signal.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm_diffusion_tpu.evaluation.audioclip import (

    ESResNeXtFBSP,
    N_FFT,
    adaptive_max_pool,
    blackmanharris_window,
    fbsp_weights,
    frame_signal,
    resize_bilinear_align_corners,
)


def test_fbsp_reduces_to_dft():
    """m=0, fb=1, fc=k ==> weights row k = (cos(k t), -sin(k t))/sqrt(N) with
    t = pi*linspace(-1,1,N): a (shifted) normalized Fourier basis.  Verify a
    projection of a random frame equals the direct complex inner product."""
    n = 64
    n_out = n // 2 + 1
    m = jnp.zeros((n_out,))
    fb = jnp.ones((n_out,))
    fc = jnp.arange(n_out, dtype=jnp.float32)
    w_re, w_im = fbsp_weights(m, fb, fc, n, normalized=True)

    t = np.pi * np.linspace(-1.0, 1.0, n) + 1e-8
    rng = np.random.RandomState(0)
    x = rng.randn(n).astype(np.float32)
    for k in (0, 3, 17):
        expect_re = (x * np.cos(k * t)).sum() / np.sqrt(n)
        expect_im = (x * -np.sin(k * t)).sum() / np.sqrt(n)
        np.testing.assert_allclose(float(x @ np.asarray(w_re[k])), expect_re, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(x @ np.asarray(w_im[k])), expect_im, rtol=1e-4, atol=1e-5)


def test_frame_signal_matches_reference_semantics():
    """Centered zero-pad and strided windows (utils/transforms.py:19-56)."""
    sig = jnp.arange(1, 11, dtype=jnp.float32)[None]  # length 10
    frames = frame_signal(sig, frame_length=4, hop_length=3, window=jnp.ones(4))
    # num_frames = 1 + ceil((10-4)/3) = 3; pad_len = 2*3+4 = 10 == len: no pad
    assert frames.shape == (1, 3, 4)
    np.testing.assert_array_equal(np.asarray(frames[0, 0]), [1, 2, 3, 4])
    np.testing.assert_array_equal(np.asarray(frames[0, 1]), [4, 5, 6, 7])
    np.testing.assert_array_equal(np.asarray(frames[0, 2]), [7, 8, 9, 10])
    # padding case: length 9, num_frames = 1+ceil(5/3)=3, pad_len=10 -> one
    # zero placed at the left (zeros split half/half, 1//2=0 left... 1 right)
    sig9 = jnp.arange(1, 10, dtype=jnp.float32)[None]
    frames9 = frame_signal(sig9, 4, 3, jnp.ones(4))
    assert frames9.shape == (1, 3, 4)


def test_window_constant():
    w = blackmanharris_window(64)
    assert w.shape == (64,)
    assert abs(w[0]) < 1e-4 and w.max() <= 1.0


def test_adaptive_max_pool_exact():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    out = adaptive_max_pool(x, (2, 2))
    np.testing.assert_array_equal(np.asarray(out[0, :, :, 0]), [[5, 7], [13, 15]])


def test_align_corners_resize_matches_torch_semantics():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 11, 17).astype(np.float32)
    ours = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), 224, 224))
    theirs = F.interpolate(
        torch.from_numpy(x), size=(224, 224), mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_tower_shapes_and_finiteness():
    model = ESResNeXtFBSP()
    audio = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 70560)) * 0.1
    variables = model.init(jax.random.PRNGKey(1), audio)
    out = model.apply(variables, audio)
    assert out.shape == (1, 1024)
    assert np.all(np.isfinite(np.asarray(out)))


def test_converter_roundtrip_structure():
    """Converter output must exactly match the module's variable structure."""
    from mm_diffusion_tpu.evaluation.audioclip import convert_audioclip_audio_tower

    model = ESResNeXtFBSP()
    audio = jnp.zeros((1, 1, 70560))
    variables = model.init(jax.random.PRNGKey(0), audio)

    # synthesize a torch-style state dict with the right shapes from the flax
    # variables, convert it back, and verify tree equality of shapes
    sd = {}
    p = variables["params"]
    s = variables["batch_stats"]
    sd["audio.fbsp.m"] = np.asarray(p["fbsp_m"])
    sd["audio.fbsp.fb"] = np.asarray(p["fbsp_fb"])
    sd["audio.fbsp.fc"] = np.asarray(p["fbsp_fc"])
    sd["audio.conv1.weight"] = np.transpose(np.asarray(p["conv1"]["kernel"]), (3, 2, 0, 1))

    def put_bn(tprefix, fp, fs):
        sd[f"{tprefix}.weight"] = np.asarray(fp["bn"]["scale"])
        sd[f"{tprefix}.bias"] = np.asarray(fp["bn"]["bias"])
        sd[f"{tprefix}.running_mean"] = np.asarray(fs["bn"]["mean"])
        sd[f"{tprefix}.running_var"] = np.asarray(fs["bn"]["var"])

    put_bn("audio.bn1", p["bn1"], s["bn1"])
    from mm_diffusion_tpu.evaluation.audioclip import LAYERS

    for li, blocks in enumerate(LAYERS):
        for bi in range(blocks):
            fn = f"layer{li + 1}_{bi}"
            tn = f"audio.layer{li + 1}.{bi}"
            for ci in (1, 2, 3):
                sd[f"{tn}.conv{ci}.weight"] = np.transpose(
                    np.asarray(p[fn][f"conv{ci}"]["kernel"]), (3, 2, 0, 1)
                )
                put_bn(f"{tn}.bn{ci}", p[fn][f"bn{ci}"], s[fn][f"bn{ci}"])
            if "downsample_conv" in p[fn]:
                sd[f"{tn}.downsample.0.weight"] = np.transpose(
                    np.asarray(p[fn]["downsample_conv"]["kernel"]), (3, 2, 0, 1)
                )
                put_bn(f"{tn}.downsample.1", p[fn]["downsample_bn"], s[fn]["downsample_bn"])
    for ai in range(1, 6):
        fn = f"att{ai}"
        tn = f"audio.att{ai}"
        sd[f"{tn}.conv_depth.weight"] = np.transpose(
            np.asarray(p[fn]["conv_depth"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{tn}.conv_depth.bias"] = np.asarray(p[fn]["conv_depth"]["bias"])
        sd[f"{tn}.conv_point.weight"] = np.transpose(
            np.asarray(p[fn]["conv_point"]["kernel"]), (3, 2, 0, 1)
        )
        sd[f"{tn}.conv_point.bias"] = np.asarray(p[fn]["conv_point"]["bias"])
        put_bn(f"{tn}.bn", p[fn]["bn"], s[fn]["bn"])
    sd["audio.fc.weight"] = np.transpose(np.asarray(p["fc"]["kernel"]), (1, 0))
    sd["audio.fc.bias"] = np.asarray(p["fc"]["bias"])

    converted = convert_audioclip_audio_tower(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = jax.tree_util.tree_leaves_with_path(converted)
    assert len(flat_a) == len(flat_b)
    path_shapes_a = {jax.tree_util.keystr(k): v.shape for k, v in flat_a}
    path_shapes_b = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in flat_b}
    assert path_shapes_a == path_shapes_b
    # and values roundtrip exactly
    out_a = ESResNeXtFBSP().apply(variables, jnp.ones((1, 1, 70560)) * 0.01)
    out_b = ESResNeXtFBSP().apply(
        jax.tree.map(jnp.asarray, converted), jnp.ones((1, 1, 70560)) * 0.01
    )
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5)

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
