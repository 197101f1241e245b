#!/usr/bin/env python3
"""Convert released PyTorch checkpoints to native Orbax checkpoints.

Replaces the reference's ``process_dist_cpkt.py`` (the ladder_net->dist_net
key rename) and extends it: the output is a ready-to-restore variables tree
for this framework.

    PYTHONPATH=. python tools/convert_checkpoint.py \
        --cfg configs/projects/dist/ssv2/vit-b16-8+16f.yaml \
        --src weights/DIST_VIT_B16.pyth --dst output/converted_ckpt

Loading converted-on-the-fly torch checkpoints directly via
``TEST.CHECKPOINT_FILE_PATH`` also works; this tool is for producing a
persistent converted artifact.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--src", required=True, help="torch .pyth/.pt checkpoint")
    parser.add_argument("--dst", required=True, help="output orbax dir")
    args = parser.parse_args()

    import numpy as np
    import orbax.checkpoint as ocp

    from dist_tpu.config import load_config
    from dist_tpu.models.clip.convert import (
        convert_clip_params, load_torch_state_dict)
    from dist_tpu.models.dist.dist_net import DiSTConfig

    cfg = load_config(args.cfg, make_output_dir=False)
    sd = load_torch_state_dict(args.src)
    dist_cfg = None
    if cfg.VIDEO.BACKBONE.get("DIST") and cfg.VIDEO.BACKBONE.DIST.ENABLE:
        dist_cfg = DiSTConfig.from_cfg(cfg)
    params, arch = convert_clip_params(sd, with_dist=dist_cfg)
    print(f"Sniffed architecture: {arch}")
    n = sum(int(np.prod(x.shape)) for x in _leaves(params))
    print(f"Converted {n:,} parameters")

    ckptr = ocp.StandardCheckpointer()
    payload = {"epoch": np.asarray(0, np.int32),
               "step": np.asarray(0, np.int32),
               "variables": {"params": params}}
    ckptr.save(os.path.abspath(args.dst), payload, force=True)
    ckptr.wait_until_finished()
    print(f"Saved orbax checkpoint at {args.dst}")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    main()
