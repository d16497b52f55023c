"""Golden torch-parity at the SHIPPED config (VERDICT r2 missing #1).

The tiny-config parity test (test_torch_parity.py) can't catch
plan-construction bugs that only appear at production scale: the middle
full-window cross-attention (gated on windows == (1,4,8),
reference multimodal_unet.py:875), headed attention at num_head_channels=64,
lw=4/8 banded windows, and the (1,2,3,4) channel mult stack.  This test runs
the reference PyTorch model and the flax model at the stock shape —
16x64^2 video + 25600 audio, 128 channels, windows (1,4,8), resolutions
(2,4,8), resblock_updown, learn_sigma both ways — with converted weights on
CPU (einsum fallbacks) and compares end to end against
/root/reference/mm_diffusion/multimodal_unet.py:1058-1101.

cross_attention_shift=False on both sides: the reference draws its shift
from Python's global `random` inside forward (multimodal_unet.py:619-622) so
a shifted run is not reproducible across frameworks; the shift indexing math
itself is parity-tested per-kernel in test_block_attention.py.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax
import jax.numpy as jnp

from mm_diffusion_tpu.models.mm_unet import MMUNetConfig, MultimodalUNet
from mm_diffusion_tpu.train.torch_import import convert_mm_unet_state_dict

VIDEO_SIZE = [16, 3, 64, 64]
AUDIO_SIZE = [1, 25600]


def build_torch_model(learn_sigma: bool):
    from mm_diffusion.multimodal_unet import MultimodalUNet as TorchMMUNet

    torch.manual_seed(0)
    model = TorchMMUNet(
        video_size=VIDEO_SIZE,
        audio_size=AUDIO_SIZE,
        model_channels=128,
        video_out_channels=6 if learn_sigma else 3,
        audio_out_channels=2 if learn_sigma else 1,
        num_res_blocks=2,
        cross_attention_resolutions=[2, 4, 8],
        cross_attention_windows=[1, 4, 8],
        cross_attention_shift=False,
        video_attention_resolutions=[2, 4, 8],
        audio_attention_resolutions=[-1],
        video_type="2d+1d",
        audio_type="1d",
        dropout=0.0,
        channel_mult=(1, 2, 3, 4),
        num_heads=4,
        num_head_channels=64,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )
    # Re-randomize EVERY parameter (zero-init heads/projections would make
    # the comparison trivially 0 == 0).  Small scale keeps the deep stack's
    # activations in a well-conditioned range for float comparison.
    g = torch.Generator().manual_seed(123)
    sd = model.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.02
    model.load_state_dict(sd)
    model.eval()
    return model


def flax_config(learn_sigma: bool):
    return MMUNetConfig(
        video_size=tuple(VIDEO_SIZE),
        audio_size=tuple(AUDIO_SIZE),
        model_channels=128,
        video_out_channels=6 if learn_sigma else 3,
        audio_out_channels=2 if learn_sigma else 1,
        num_res_blocks=2,
        cross_attention_resolutions=(2, 4, 8),
        cross_attention_windows=(1, 4, 8),
        cross_attention_shift=False,
        video_attention_resolutions=(2, 4, 8),
        audio_attention_resolutions=(-1,),
        channel_mult=(1, 2, 3, 4),
        dropout=0.0,
        num_heads=4,
        num_head_channels=64,
        use_scale_shift_norm=True,
        resblock_updown=True,
        dtype="float32",
    )


@pytest.mark.slow
@pytest.mark.parametrize("learn_sigma", [False, True])
def test_stock_config_forward_parity(learn_sigma):
    tm = build_torch_model(learn_sigma)
    cfg = flax_config(learn_sigma)
    fm = MultimodalUNet(cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, unused = convert_mm_unet_state_dict(sd, cfg)
    assert unused == [], f"unconverted torch keys: {unused[:10]}"

    rng = np.random.RandomState(0)
    b = 1
    f, c, h, w = VIDEO_SIZE
    ca, l = AUDIO_SIZE
    video_t = rng.randn(b, f, c, h, w).astype(np.float32)
    audio_t = rng.randn(b, ca, l).astype(np.float32)
    t = np.array([137], np.int64)

    with torch.no_grad():
        tv, ta = tm(
            torch.from_numpy(video_t), torch.from_numpy(audio_t),
            torch.from_numpy(t),
        )
    tv = tv.numpy()  # [B,F,C,H,W]
    ta = ta.numpy()  # [B,C,L]
    assert float(np.abs(tv).max()) > 1e-3  # non-trivial oracle
    assert float(np.abs(ta).max()) > 1e-3

    # free the torch model before the jax forward: both sides of this test
    # are the full stock 128-ch model, and holding them simultaneously at
    # the tail of a long suite run has aborted on native allocation pressure
    import gc

    del tm, sd
    gc.collect()

    video_j = jnp.asarray(np.transpose(video_t, (0, 1, 3, 4, 2)))
    audio_j = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    try:
        fv, fa = fm.apply({"params": params}, video_j, audio_j, jnp.asarray(t))
        fv = np.transpose(np.asarray(fv), (0, 1, 4, 2, 3))
        fa = np.transpose(np.asarray(fa), (0, 2, 1))

        np.testing.assert_allclose(fv, tv, rtol=5e-3, atol=5e-4)
        np.testing.assert_allclose(fa, ta, rtol=5e-3, atol=5e-4)
    finally:
        # drop this config's jit/eager caches — the stock model's compiled
        # programs are the largest in the suite and never hit again
        jax.clear_caches()
