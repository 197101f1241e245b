#!/usr/bin/env python3
"""Average model weights across checkpoints (SWA / model-soup style).

    PYTHONPATH=. python tools/average_checkpoints.py \
        --ckpts out/checkpoints/checkpoint_epoch_00018 \
                out/checkpoints/checkpoint_epoch_00019 \
                out/checkpoints/checkpoint_epoch_00020 \
        --out out/checkpoints/avg_18_20

Averaging the last few epochs' weights is a standard accuracy lever the
reference has no tool for. Inputs are orbax checkpoint dirs (convert torch
``.pyth`` first with tools/convert_checkpoint.py); the output is an orbax
checkpoint carrying only ``variables`` — loadable anywhere a trained
checkpoint is (``TEST.CHECKPOINT_FILE_PATH``, the serving engine,
tools/export_model.py). Float leaves are averaged in fp64 and cast back;
integer leaves (BN counters) and non-arrays take the first checkpoint's
value. ``--ema`` averages the EMA weights instead when present.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def average_trees(trees):
    import jax
    import numpy as np

    flats = []
    treedef0 = None
    for t in trees:
        flat, treedef = jax.tree_util.tree_flatten(t)
        if treedef0 is None:
            treedef0 = treedef
        else:
            assert treedef == treedef0, (
                "checkpoints carry different parameter trees — are they "
                "from the same config?")
        flats.append(flat)
    out = []
    for leaves in zip(*flats):
        first = np.asarray(leaves[0])
        if np.issubdtype(first.dtype, np.floating):
            acc = np.mean([np.asarray(x, np.float64) for x in leaves], axis=0)
            out.append(acc.astype(first.dtype))
        else:
            out.append(first)
    return jax.tree_util.tree_unflatten(treedef0, out)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpts", nargs="+", required=True,
                    help="two or more orbax checkpoint dirs")
    ap.add_argument("--out", required=True, help="output orbax dir")
    ap.add_argument("--ema", action="store_true",
                    help="average the EMA weights instead of the raw ones")
    args = ap.parse_args()
    assert len(args.ckpts) >= 2, "need at least two checkpoints to average"

    import orbax.checkpoint as ocp

    from dist_tpu.utils.checkpoint import load_checkpoint

    key = "ema_variables" if args.ema else "variables"
    trees = []
    for path in args.ckpts:
        restored = load_checkpoint(os.path.abspath(path))
        assert key in restored, (path, sorted(restored))
        trees.append(restored[key])
    avg = average_trees(trees)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(args.out), {"variables": avg}, force=True)
    ckptr.wait_until_finished()
    print(f"averaged {len(trees)} checkpoints ({key}) -> {args.out}")


if __name__ == "__main__":
    main()
