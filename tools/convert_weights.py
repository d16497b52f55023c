"""Convert the published PyTorch checkpoints into native Orbax snapshots.

One-command replacement for the reference's auto-download + in-process torch
loads (evaluations/fvd/download.py:27-63, py_scripts' direct ``torch.load``):
this environment has no egress, so the user downloads the published files
(README "Models" table of the reference: Landscape[_SR].pt, AIST++[_SR].pt,
guided-diffusion_64_256_upsampler.pt, i3d_pretrained_400.pt,
AudioCLIP-Full-Training.pt) and converts each ONCE; every CLI then runs
torch-free from the converted directory.  The conversion manifest records
the source file's sha256 and the parameter census so a converted tree is
verifiable and reproducible (docs/WEIGHTS.md walks through the recipe and
pins the published files' checksums).

Usage:
    python tools/convert_weights.py i3d       i3d_pretrained_400.pt   OUT_DIR
    python tools/convert_weights.py i3d_tf    i3d-kinetics-400/       OUT_DIR
    python tools/convert_weights.py audioclip AudioCLIP-Full-Training.pt OUT_DIR
    python tools/convert_weights.py mm_unet   Landscape.pt            OUT_DIR \
        [--video_size 16,3,64,64 --audio_size 1,25600 ...model flags]
    python tools/convert_weights.py image_sr  Landscape_SR.pt         OUT_DIR \
        [--large_size 256 --small_size 64 ...sr model flags]

Every CLI accepts the OUT_DIR anywhere it accepts a ``.pt`` path.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Conversion is pure host-side tensor shuffling — never boot the TPU for it.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

KINDS = (
    "i3d",
    "i3d_tf",
    "audioclip",
    "audioclip_audio",
    "mm_unet",
    "image_sr",
    "image",
)


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _census(tree) -> dict:
    leaves = jax.tree_util.tree_leaves(tree)
    return {
        "n_arrays": len(leaves),
        "n_params": int(sum(int(np.prod(l.shape)) for l in leaves)),
    }


def _convert(kind: str, src: str, extra: list) -> tuple:
    """Returns (tree_to_save, config_record)."""
    if kind in ("mm_unet", "image_sr", "image"):
        return _convert_model(kind, src, extra)

    if kind == "i3d_tf":
        # TF-Hub i3d-kinetics module (TensorBundle), parsed without TF —
        # replaces the reference's evaluations/fvd/convert_tf_pretrained.py.
        from mm_diffusion_tpu.evaluation.tf_bundle import load_tf_i3d

        return load_tf_i3d(src), {}

    import torch

    sd = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    if kind == "i3d":
        from mm_diffusion_tpu.evaluation.i3d import convert_torch_i3d

        tree = convert_torch_i3d({k: v.numpy() for k, v in sd.items()})
        return tree, {}

    npsd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}

    if kind == "audioclip":
        from mm_diffusion_tpu.evaluation.audioclip import convert_audioclip_audio_tower
        from mm_diffusion_tpu.evaluation.clip_model import convert_clip_visual

        tree = {
            "audio": convert_audioclip_audio_tower(npsd, prefix="audio."),
            "visual": convert_clip_visual(npsd, prefix="visual."),
            "scale_ai": np.float32(npsd.get("logit_scale_ai", np.log(100.0))),
        }
        return tree, {}

    assert kind == "audioclip_audio", kind
    from mm_diffusion_tpu.evaluation.audioclip import convert_audioclip_audio_tower

    return convert_audioclip_audio_tower(npsd, prefix="audio."), {}


def _convert_model(kind: str, src: str, extra: list) -> tuple:
    from mm_diffusion_tpu import configs
    from mm_diffusion_tpu.configs import add_dict_to_argparser, args_to_dict

    if kind == "mm_unet":
        from mm_diffusion_tpu.train.torch_import import load_torch_checkpoint

        defaults = configs.model_and_diffusion_defaults()
        parser = argparse.ArgumentParser()
        add_dict_to_argparser(parser, defaults)
        args = parser.parse_args(extra)
        cfg = configs.create_model_config(
            **args_to_dict(args, configs.model_defaults().keys())
        )
        return {"params": load_torch_checkpoint(src, cfg)}, vars(args)

    # image / image_sr (guided-diffusion layouts)
    from mm_diffusion_tpu.train.torch_import import load_torch_image_checkpoint

    defaults = configs.image_sr_model_and_diffusion_defaults()
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    args = parser.parse_args(extra)
    sr_kwargs = args_to_dict(args, defaults.keys())
    cfg = configs.create_image_sr_config(**sr_kwargs)
    return (
        {"params": load_torch_image_checkpoint(src, cfg, super_res=(kind == "image_sr"))},
        vars(args),
    )


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3 or argv[0] not in KINDS:
        print(__doc__)
        print(f"kinds: {', '.join(KINDS)}")
        return 2
    kind, src, out_dir, extra = argv[0], argv[1], argv[2], argv[3:]

    if kind == "i3d_tf":
        # Source is a bundle (index + data shards), not one file: hash the
        # resolved prefix's files in name order so the manifest stays
        # reproducible and auditable per-file.
        from mm_diffusion_tpu.evaluation.tf_bundle import find_bundle_prefix

        prefix = find_bundle_prefix(src)
        d, base = os.path.split(prefix)
        h = hashlib.sha256()
        for name in sorted(os.listdir(d)):
            if name.startswith(base + "."):
                part = sha256_file(os.path.join(d, name))
                print(f"source {os.path.join(d, name)}\n  sha256 {part}")
                h.update(name.encode() + b"\0" + bytes.fromhex(part))
        src_sha = h.hexdigest()
        print(f"  combined sha256 {src_sha}")
    else:
        src_sha = sha256_file(src)
        print(f"source {src}\n  sha256 {src_sha}")
    tree, config = _convert(kind, src, extra)

    from mm_diffusion_tpu.train.checkpoint import save_params

    out_dir = os.path.abspath(out_dir)
    save_params(out_dir, tree)
    manifest = {
        "kind": kind,
        "source": os.path.basename(src),
        "source_sha256": src_sha,
        "census": _census(tree),
        "config": {k: v for k, v in config.items()},
        "format": "orbax StandardCheckpointer",
    }
    with open(os.path.join(out_dir, "CONVERSION.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=str)
    print(f"converted -> {out_dir}")
    print(json.dumps(manifest["census"]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
