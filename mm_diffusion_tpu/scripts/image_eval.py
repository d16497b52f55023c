"""Standalone image-set evaluation CLI: IS / FID / sFID / KID / P&R.

Replacement for the reference's TF1 npz evaluator CLI
(`evaluations/compute_image_is.py:27-66`: ``python compute_image_is.py
ref_batch sample_batch``) — same positional batch arguments (npz batches or
image directories).  Two embedding protocols:

* ``--inception_pb classify_image_graph_def.pb``: the EXACT legacy protocol
  — the frozen TF1 InceptionV3 graph is executed with jax ops
  (evaluation/graphdef.py), yielding Inception-IS / Inception-FID / sFID
  comparable to published tables (the .pb must be downloaded once; this
  environment has no egress).
* ``--clip_checkpoint``: CLIP-visual FID/KID (self-consistent, NOT
  comparable to Inception numbers) when the .pb is unavailable.
"""

from __future__ import annotations

import argparse
import json

from ..evaluation.image_eval import eval_images
from ..utils import logger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("ref_batch", help=".npz batch or image directory (reference set)")
    parser.add_argument("sample_batch", help=".npz batch or image directory (sample set)")
    parser.add_argument("--output_dir", type=str, default="./image_eval_out")
    parser.add_argument("--clip_checkpoint", type=str, default="",
                        help="AudioCLIP-Full or OpenAI CLIP RN50 .pt (visual tower)")
    parser.add_argument("--inception_pb", type=str, default="",
                        help="classify_image_graph_def.pb: run the EXACT "
                        "legacy protocol (Inception-IS, Inception-FID, sFID) "
                        "by executing the frozen TF1 graph with jax")
    parser.add_argument("--sample_num", type=int, default=0,
                        help="cap images per side (0 = all)")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument(
        "--allow_fallback",
        action="store_true",
        help="permit pixel-statistics embeddings when no CLIP checkpoint is "
        "given (relative numbers only; NOT a perceptual metric space)",
    )
    args = parser.parse_args(argv)

    logger.configure(args.output_dir)
    metrics = eval_images(
        args.ref_batch,
        args.sample_batch,
        clip_checkpoint=args.clip_checkpoint or None,
        eval_num=args.sample_num or None,
        batch_size=args.batch_size,
        allow_fallback=args.allow_fallback,
        inception_pb=args.inception_pb or None,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
