"""Golden parity: the reference PyTorch MultimodalUNet vs. this framework's
flax model with weights converted through the torch-import shim.

This is the strongest correctness evidence available offline: identical
random weights, identical inputs, outputs must agree to float32 tolerance.
The reference implementation is imported read-only from /root/reference
purely as a test oracle.
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

VIDEO_SIZE = [4, 3, 16, 16]
AUDIO_SIZE = [1, 1024]


def build_torch_model():
    from mm_diffusion.multimodal_unet import MultimodalUNet as TorchMMUNet

    torch.manual_seed(0)
    model = TorchMMUNet(
        video_size=VIDEO_SIZE,
        audio_size=AUDIO_SIZE,
        model_channels=32,
        video_out_channels=3,
        audio_out_channels=1,
        num_res_blocks=1,
        cross_attention_resolutions=[2],
        cross_attention_windows=[1],
        cross_attention_shift=False,
        video_attention_resolutions=[2],
        audio_attention_resolutions=[-1],
        video_type="2d+1d",
        audio_type="1d",
        dropout=0.0,
        channel_mult=(1, 2),
        num_heads=2,
        num_head_channels=-1,
        use_scale_shift_norm=True,
        resblock_updown=True,
    )
    # Re-randomize EVERY parameter (the reference zero-inits output heads and
    # projections, which would make a parity check trivially 0 == 0).
    g = torch.Generator().manual_seed(123)
    sd = model.state_dict()
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=g) * 0.05
    model.load_state_dict(sd)
    model.eval()
    return model


def flax_config():
    return MMUNetConfig(
        video_size=tuple(VIDEO_SIZE),
        audio_size=tuple(AUDIO_SIZE),
        model_channels=32,
        video_out_channels=3,
        audio_out_channels=1,
        num_res_blocks=1,
        cross_attention_resolutions=(2,),
        cross_attention_windows=(1,),
        cross_attention_shift=False,
        video_attention_resolutions=(2,),
        audio_attention_resolutions=(-1,),
        channel_mult=(1, 2),
        dropout=0.0,
        num_heads=2,
        num_head_channels=-1,
        use_scale_shift_norm=True,
        resblock_updown=True,
        dtype="float32",
    )


@pytest.fixture(scope="module")
def models():
    tm = build_torch_model()
    cfg = flax_config()
    fm = MultimodalUNet(cfg)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, unused = convert_mm_unet_state_dict(sd, cfg)
    assert unused == [], f"unconverted torch keys: {unused[:10]}"
    return tm, fm, params


def test_forward_parity(models):
    tm, fm, params = models
    rng = np.random.RandomState(0)
    b = 2
    f, c, h, w = VIDEO_SIZE
    ca, l = AUDIO_SIZE
    video_t = rng.randn(b, f, c, h, w).astype(np.float32)
    audio_t = rng.randn(b, ca, l).astype(np.float32)
    t = np.array([7, 42], np.int64)

    with torch.no_grad():
        tv, ta = tm(
            torch.from_numpy(video_t), torch.from_numpy(audio_t), torch.from_numpy(t)
        )
    tv = tv.numpy()  # [B,F,C,H,W]
    ta = ta.numpy()  # [B,C,L]

    # channels-last inputs for the flax model
    video_j = jnp.asarray(np.transpose(video_t, (0, 1, 3, 4, 2)))
    audio_j = jnp.asarray(np.transpose(audio_t, (0, 2, 1)))
    fv, fa = fm.apply({"params": params}, video_j, audio_j, jnp.asarray(t))
    fv = np.transpose(np.asarray(fv), (0, 1, 4, 2, 3))
    fa = np.transpose(np.asarray(fa), (0, 2, 1))

    np.testing.assert_allclose(fv, tv, rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(fa, ta, rtol=2e-3, atol=2e-4)


def test_parity_is_nontrivial(models):
    """Guard against trivially-zero outputs masking a broken comparison."""
    tm, fm, params = models
    rng = np.random.RandomState(1)
    b = 1
    f, c, h, w = VIDEO_SIZE
    ca, l = AUDIO_SIZE
    video_t = rng.randn(b, f, c, h, w).astype(np.float32)
    audio_t = rng.randn(b, ca, l).astype(np.float32)
    t = np.array([500], np.int64)
    with torch.no_grad():
        tv, ta = tm(
            torch.from_numpy(video_t), torch.from_numpy(audio_t), torch.from_numpy(t)
        )
    assert float(np.abs(tv.numpy()).max()) > 1e-3
    assert float(np.abs(ta.numpy()).max()) > 1e-3
