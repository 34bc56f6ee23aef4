"""Evaluate a directory of already-generated wavs against references.

Equivalent of reference evaluate_existing.py:42-59.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate existing generations")
    p.add_argument("--gen_dir", type=str, required=True)
    p.add_argument("--ref_dir", type=str, required=True)
    p.add_argument("--captions_json", type=str, default=None,
                   help="json mapping wav filename -> caption (for CLAP)")
    p.add_argument("--cnn14_checkpoint", type=str,
                   default="ckpt/Cnn14_16k_mAP=0.438.pth")
    p.add_argument("--vggish_checkpoint", type=str, default="ckpt/vggish.pth")
    p.add_argument("--clap_checkpoint", type=str,
                   default="ckpt/music_audioset_epoch_15_esc_90.14.pt")
    p.add_argument("--limit_num", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None):
    from consistencytta_tpu.evaluation.harness import EvaluationHelper

    args = parse_args(argv)
    captions = None
    if args.captions_json:
        with open(args.captions_json) as f:
            captions = json.load(f)

    helper = EvaluationHelper(
        cnn14_checkpoint=args.cnn14_checkpoint,
        vggish_checkpoint=args.vggish_checkpoint,
        clap_checkpoint=args.clap_checkpoint,
    )
    result = helper.main(
        args.gen_dir, args.ref_dir, captions=captions, limit_num=args.limit_num
    )
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
