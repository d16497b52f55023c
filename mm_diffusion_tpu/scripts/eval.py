"""Standalone FVD/KVD/FAD evaluation CLI.

CLI-parity re-design of `py_scripts/eval.py` + `mm_diffusion/evaluator.py:176-194`.
"""

from __future__ import annotations

import argparse
import json

from ..evaluation import eval_multimodal
from ..utils import logger


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_dir", type=str, required=True)
    parser.add_argument("--fake_dir", type=str, required=True)
    parser.add_argument("--output_dir", type=str, default="./eval_out")
    parser.add_argument("--sample_num", type=int, default=2048)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--i3d_checkpoint", type=str, default="")
    parser.add_argument("--audioclip_checkpoint", type=str, default="")
    parser.add_argument("--compute_is", action="store_true")
    parser.add_argument(
        "--allow_fallback",
        action="store_true",
        help="permit pixel/log-mel fallback embedders (relative numbers only; "
        "NOT the published FVD/KVD/FAD protocol)",
    )
    args = parser.parse_args(argv)

    logger.configure(args.output_dir)
    metrics = eval_multimodal(
        args.ref_dir,
        args.fake_dir,
        eval_num=args.sample_num,
        i3d_checkpoint=args.i3d_checkpoint or None,
        audioclip_checkpoint=args.audioclip_checkpoint or None,
        batch_size=args.batch_size,
        compute_is=args.compute_is,
        allow_fallback=args.allow_fallback,
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
