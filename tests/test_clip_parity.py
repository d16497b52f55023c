"""Golden parity: flax CLIP visual (ModifiedResNet) + text towers vs the
reference's vendored CLIP (evaluations/AudioCLIP/model/clip/model.py).

Completes the AudioCLIP port (VERDICT r1 item 10): with these towers the
evaluator can compute the AV-alignment scores the reference gathers
(get_embedding.py:69-78) on top of FAD.
"""

import importlib.util

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mm_diffusion_tpu.evaluation.clip_model import (  # noqa: E402

    AudioCLIPScorer,
    CLIPTextEncoder,
    CLIPVisualResNet,
    convert_clip_text,
    convert_clip_visual,
)

_CLIP_PATH = "/root/reference/evaluations/AudioCLIP/model/clip/model.py"


def _load_ref():
    spec = importlib.util.spec_from_file_location("ref_clip_model", _CLIP_PATH)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _randomize_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in model.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)


def test_clip_visual_parity():
    mod = _load_ref()
    tmodel = mod.ModifiedResNet(
        layers=(3, 4, 6, 3), output_dim=1024, heads=32, input_resolution=64, width=64
    )
    tmodel.eval()
    _randomize_(tmodel)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()

    sd = {f"visual.{k}": v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_clip_visual(sd)
    fmodel = CLIPVisualResNet()
    f_out = np.asarray(jax.jit(lambda v: fmodel.apply(variables, v))(x))

    assert f_out.shape == t_out.shape == (2, 1024)
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(f_out, t_out, rtol=3e-3, atol=3e-3 * scale)


def test_clip_text_parity():
    mod = _load_ref()
    tclip = mod.CLIP(
        embed_dim=64,
        image_resolution=32,
        vision_layers=(1, 1, 1, 1),
        vision_width=16,
        vision_patch_size=None,
        context_length=16,
        vocab_size=100,
        transformer_width=32,
        transformer_heads=4,
        transformer_layers=2,
    )
    tclip.eval()
    _randomize_(tclip, seed=1)

    rng = np.random.RandomState(1)
    tokens = rng.randint(1, 99, size=(3, 16)).astype(np.int64)
    tokens[:, -1] = 99  # highest id = eot -> argmax pooling picks last position
    with torch.no_grad():
        t_out = tclip.encode_text(torch.from_numpy(tokens)).numpy()

    sd = {k: v.numpy() for k, v in tclip.state_dict().items()}
    variables = convert_clip_text(sd, layers=2)
    fmodel = CLIPTextEncoder(
        vocab_size=100, context_length=16, width=32, heads=4, layers=2, embed_dim=64
    )
    f_out = np.asarray(
        jax.jit(lambda t: fmodel.apply(variables, t))(jnp.asarray(tokens, jnp.int32))
    )
    assert f_out.shape == t_out.shape == (3, 64)
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(f_out, t_out, rtol=3e-3, atol=3e-3 * scale)


def test_av_scorer_shapes():
    """AudioCLIPScorer end-to-end on random weights: shapes + score formula
    (score == scale * cos-sim of normalized audio vs frame-mean video emb)."""
    from mm_diffusion_tpu.evaluation.audioclip import ESResNeXtFBSP

    audio_model = ESResNeXtFBSP()
    visual_model = CLIPVisualResNet(layers=(1, 1, 1, 1), output_dim=1024)
    rng = np.random.RandomState(2)
    audio = rng.uniform(-1, 1, (2, 1, 22050)).astype(np.float32)
    video = rng.randint(0, 255, (2, 3, 64, 64, 3), np.uint8)

    a_vars = audio_model.init(jax.random.PRNGKey(0), audio)
    v_vars = visual_model.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 224, 224, 3))
    )
    scorer = AudioCLIPScorer(audio_model, a_vars, visual_model, v_vars, np.log(50.0))
    assert abs(scorer.scale_ai - 50.0) < 1e-4

    emb_a = scorer.embed_audio(audio)
    raw_v, norm_v = scorer.embed_video(video)
    scores = scorer.av_scores(audio, video)
    assert emb_a.shape == (2, 1024) and raw_v.shape == (2, 1024)
    a_hat = emb_a / np.linalg.norm(emb_a, axis=-1, keepdims=True)
    np.testing.assert_allclose(
        scores, 50.0 * np.sum(a_hat * norm_v, axis=-1), rtol=1e-4, atol=1e-5
    )

# heavy compiles: slow tier (run with `pytest -m slow` or no -m filter)
pytestmark = pytest.mark.slow
