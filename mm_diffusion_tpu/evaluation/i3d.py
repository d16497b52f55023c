"""InceptionI3d (Kinetics-400) in flax — the FVD/KVD embedding network.

TPU-native re-implementation of the vendored PyTorch I3D
(`evaluations/fvd/pytorch_i3d.py:137-334`): same architecture (Inception-v1
inflated to 3D, TF-SAME padding, BN eps 1e-3), channels-last ``[B,T,H,W,C]``
layout, eval-mode batch norm folded from imported running stats.

Weights: the reference downloads ``i3d_pretrained_400.pt`` from Google Drive
(evaluations/fvd/download.py).  This environment has no egress, so
:func:`convert_torch_i3d` converts that checkpoint (if present on disk) into
this module's parameter pytree; FVD/KVD numbers are only meaningful with the
converted pretrained weights.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (name, out_channels list) for each inception block; in_channels implied.
# Parity: pytorch_i3d.py:231-275.
INCEPTION_CFG = {
    "Mixed_3b": [64, 96, 128, 16, 32, 32],
    "Mixed_3c": [128, 128, 192, 32, 96, 64],
    "Mixed_4b": [192, 96, 208, 16, 48, 64],
    "Mixed_4c": [160, 112, 224, 24, 64, 64],
    "Mixed_4d": [128, 128, 256, 24, 64, 64],
    "Mixed_4e": [112, 144, 288, 32, 64, 64],
    "Mixed_4f": [256, 160, 320, 32, 128, 128],
    "Mixed_5b": [256, 160, 320, 32, 128, 128],
    "Mixed_5c": [384, 192, 384, 48, 128, 128],
}


class Unit3D(nn.Module):
    """Conv3D + frozen BatchNorm + ReLU (parity: Unit3D, pytorch_i3d.py:39-106)."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    stride: Sequence[int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            kernel_size=tuple(self.kernel),
            strides=tuple(self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            name="conv3d",
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, momentum=0.99, name="bn"
            )(x)
        if self.activation:
            x = nn.relu(x)
        return x


def max_pool_same(x, kernel, stride):
    """TF-SAME max pool (parity: MaxPool3dSamePadding, pytorch_i3d.py:9-36)."""
    return nn.max_pool(
        x, window_shape=tuple(kernel), strides=tuple(stride), padding="SAME"
    )


class InceptionModule(nn.Module):
    """(parity: InceptionModule, pytorch_i3d.py:109-134)"""

    out_channels: Sequence[int]

    @nn.compact
    def __call__(self, x):
        oc = self.out_channels
        b0 = Unit3D(oc[0], name="b0")(x)
        b1 = Unit3D(oc[2], kernel=(3, 3, 3), name="b1b")(Unit3D(oc[1], name="b1a")(x))
        b2 = Unit3D(oc[4], kernel=(3, 3, 3), name="b2b")(Unit3D(oc[3], name="b2a")(x))
        b3 = Unit3D(oc[5], name="b3b")(max_pool_same(x, (3, 3, 3), (1, 1, 1)))
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionI3d(nn.Module):
    """(parity: InceptionI3d, pytorch_i3d.py:137-321).

    Input: ``[B, T, H, W, 3]`` in [-1, 1] (T>=9 after stem for the (2,7,7)
    average pool at 224^2 x 16f).  Output: ``[B, num_classes]`` logits,
    time-averaged — exactly the FVD embedding used by the reference
    (fvd.py:109-123 + forward :306-318).
    """

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, kernel=(7, 7, 7), stride=(2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, kernel=(3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = max_pool_same(x, (1, 3, 3), (1, 2, 2))
        x = InceptionModule(INCEPTION_CFG["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionModule(INCEPTION_CFG["Mixed_3c"], name="Mixed_3c")(x)
        x = max_pool_same(x, (3, 3, 3), (2, 2, 2))
        for k in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
            x = InceptionModule(INCEPTION_CFG[k], name=k)(x)
        x = max_pool_same(x, (2, 2, 2), (2, 2, 2))
        x = InceptionModule(INCEPTION_CFG["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionModule(INCEPTION_CFG["Mixed_5c"], name="Mixed_5c")(x)
        # avg pool (2,7,7) stride 1, VALID (parity: nn.AvgPool3d, ref :278-279)
        x = nn.avg_pool(x, window_shape=(2, 7, 7), strides=(1, 1, 1), padding="VALID")
        x = Unit3D(
            self.num_classes, use_bn=False, activation=False, use_bias=True,
            name="logits",
        )(x)
        # squeeze spatial, average time (parity: forward, ref :313-318)
        x = x.mean(axis=(1, 2, 3))
        return x


# ---------------------------------------------------------------------------
# torch checkpoint conversion
# ---------------------------------------------------------------------------

_STEM = {
    "Conv3d_1a_7x7",
    "Conv3d_2b_1x1",
    "Conv3d_2c_3x3",
    "logits",
}


def _convert_unit(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """torch Unit3D params -> flax Unit3D params.  torch conv weight is
    [O, I, kT, kH, kW]; flax wants [kT, kH, kW, I, O]."""
    out: Dict[str, Any] = {}
    w = np.asarray(sd[f"{prefix}.conv3d.weight"])
    conv = {"kernel": np.transpose(w, (2, 3, 4, 1, 0))}
    if f"{prefix}.conv3d.bias" in sd:
        conv["bias"] = np.asarray(sd[f"{prefix}.conv3d.bias"])
    out["conv3d"] = conv
    if f"{prefix}.bn.weight" in sd:
        out["bn"] = {
            "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
        }
    return out


def _convert_bn_stats(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    if f"{prefix}.bn.running_mean" not in sd:
        return {}
    return {
        "bn": {
            "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
            "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
        }
    }


def convert_torch_i3d(state_dict: Dict[str, Any]):
    """Convert the reference's ``i3d_pretrained_400.pt`` state dict into
    ``{"params": ..., "batch_stats": ...}`` for :class:`InceptionI3d`."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for name in _STEM:
        put(params, (name,), _convert_unit(state_dict, name))
        bn = _convert_bn_stats(state_dict, name)
        if bn:
            put(stats, (name,), bn)

    for mixed in INCEPTION_CFG:
        for branch in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b"):
            prefix = f"{mixed}.{branch}"
            put(params, (mixed, branch), _convert_unit(state_dict, prefix))
            bn = _convert_bn_stats(state_dict, prefix)
            if bn:
                put(stats, (mixed, branch), bn)

    return {"params": params, "batch_stats": stats}


def load_i3d(checkpoint_path: str):
    """Load the I3D weights from any of the three published sources: the
    torch ``.pt`` (converted in-process; the reference auto-downloads it,
    evaluations/fvd/download.py, which needs egress), the TF-Hub module's
    TensorBundle (``i3d-kinetics-400`` dir / ``variables.index`` — the
    TF-source path of evaluations/fvd/convert_tf_pretrained.py, parsed
    without TensorFlow by :mod:`.tf_bundle`), or a native Orbax directory
    produced once by ``tools/convert_weights.py i3d|i3d_tf`` (torch- and
    TF-free from then on)."""
    import os

    model = InceptionI3d()
    from .tf_bundle import find_bundle_prefix, load_tf_i3d

    try:
        find_bundle_prefix(checkpoint_path)
    except (FileNotFoundError, ValueError):
        pass
    else:
        return model, load_tf_i3d(checkpoint_path)
    if os.path.isdir(checkpoint_path):
        from ..train.checkpoint import restore_params

        return model, restore_params(checkpoint_path)
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu")
    variables = convert_torch_i3d({k: v.numpy() for k, v in sd.items()})
    return model, variables
