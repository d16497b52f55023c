"""Golden parity: reference PyTorch ImageUnet/ImageSuperResModel vs the flax
image UNet with weights converted through `convert_image_unet_state_dict`.

Round-2 item (VERDICT missing #2): without this importer the published
guided-diffusion 64->256 SR weights (train_util.py:26 PRE_TRAIN_MODELS,
ssh_scripts/image_sr_train.sh:10) cannot be used, so there is no path to
paper-parity 256^2 samples.  Same recipe as tests/test_torch_parity.py.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mm_diffusion_tpu.models.image_unet import (  # noqa: E402
    ImageSuperResModel,
    ImageUNet,
    ImageUNetConfig,
)
from mm_diffusion_tpu.train.torch_import import (  # noqa: E402
    convert_image_unet_state_dict,
)


def _randomize_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)


def _make_pair(cfg: ImageUNetConfig):
    from mm_diffusion.image_unet import ImageUnet as TorchImageUnet

    tmodel = TorchImageUnet(
        image_size=cfg.image_size,
        in_channels=cfg.in_channels,
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=set(cfg.attention_resolutions),
        dropout=0.0,
        channel_mult=tuple(cfg.channel_mult),
        conv_resample=cfg.conv_resample,
        num_classes=cfg.num_classes,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_heads_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
    )
    tmodel.eval()
    _randomize_(tmodel)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, unused = convert_image_unet_state_dict(sd, cfg)
    assert not unused, f"unconverted reference keys: {unused[:8]}"
    return tmodel, params


def _compare(tmodel, params, cfg, label=None):
    rng = np.random.RandomState(0)
    x = rng.randn(2, cfg.image_size, cfg.image_size, cfg.in_channels).astype(np.float32)
    t = np.array([7, 341], np.int64)
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            y=torch.from_numpy(label) if label is not None else None,
        ).numpy()
    fmodel = ImageUNet(cfg)
    f_out = np.asarray(
        jax.jit(lambda x_, t_, y_: fmodel.apply({"params": params}, x_, t_, label=y_))(
            x, jnp.asarray(t, jnp.int32), jnp.asarray(label) if label is not None else None
        )
    )
    t_out = np.transpose(t_out, (0, 2, 3, 1))
    assert f_out.shape == t_out.shape
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(f_out, t_out, rtol=2e-3, atol=2e-3 * max(scale, 1e-3))


def test_image_unet_parity_sr_style():
    """SR-model shape: scale-shift norm, learn_sigma out, attn at ds 8/16."""
    cfg = ImageUNetConfig(
        image_size=32,
        in_channels=6,  # SR: x + upsampled low_res
        model_channels=32,
        out_channels=6,  # learn_sigma
        num_res_blocks=2,
        attention_resolutions=(4, 8),
        channel_mult=(1, 1, 2, 2),
        num_heads=4,
        use_scale_shift_norm=True,
        resblock_updown=False,
        dtype="float32",
    )
    tmodel, params = _make_pair(cfg)
    _compare(tmodel, params, cfg)


def test_image_unet_parity_updown_headch():
    """resblock_updown + num_head_channels branch coverage."""
    cfg = ImageUNetConfig(
        image_size=16,
        in_channels=3,
        model_channels=32,
        out_channels=3,
        num_res_blocks=1,
        attention_resolutions=(2, 4),
        channel_mult=(1, 2),
        num_heads=1,
        num_head_channels=16,
        use_scale_shift_norm=False,
        resblock_updown=True,
        dtype="float32",
    )
    tmodel, params = _make_pair(cfg)
    _compare(tmodel, params, cfg)


def test_image_super_res_wrapping():
    """ImageSuperResModel: low_res bilinear upsample + concat matches the
    torch wrapper (image_unet.py:700-715)."""
    from mm_diffusion.image_unet import ImageSuperResModel as TorchSR

    cfg = ImageUNetConfig(
        image_size=32,
        in_channels=6,
        model_channels=32,
        out_channels=3,
        num_res_blocks=1,
        attention_resolutions=(4,),
        channel_mult=(1, 2),
        num_heads=2,
        use_scale_shift_norm=True,
        dtype="float32",
    )
    tmodel = TorchSR(
        image_size=cfg.image_size,
        in_channels=3,  # torch wrapper doubles internally
        model_channels=cfg.model_channels,
        out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions={4},
        channel_mult=(1, 2),
        num_heads=2,
        use_scale_shift_norm=True,
    )
    tmodel.eval()
    _randomize_(tmodel)
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, unused = convert_image_unet_state_dict(sd, cfg)
    assert not unused

    rng = np.random.RandomState(1)
    x = rng.randn(1, 32, 32, 3).astype(np.float32)
    lr = rng.randn(1, 8, 8, 3).astype(np.float32)
    t = np.array([11], np.int64)
    with torch.no_grad():
        t_out = tmodel(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
            torch.from_numpy(t),
            low_res=torch.from_numpy(np.transpose(lr, (0, 3, 1, 2))),
        ).numpy()
    fmodel = ImageSuperResModel(cfg)
    f_out = np.asarray(
        jax.jit(
            lambda x_, t_, lr_: fmodel.apply(
                {"params": {"unet": params}}, x_, t_, low_res=lr_
            )
        )(x, jnp.asarray(t, jnp.int32), lr)
    )
    t_out = np.transpose(t_out, (0, 2, 3, 1))
    scale = np.abs(t_out).max()
    np.testing.assert_allclose(f_out, t_out, rtol=2e-3, atol=2e-3 * max(scale, 1e-3))
