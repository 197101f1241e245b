#!/usr/bin/env python3
"""Export a trained model to a self-contained StableHLO artifact.

    PYTHONPATH=. python tools/export_model.py \
        --cfg configs/projects/dist/k400/vit-b16-8+16f-eval.yaml \
        --out k400_b16.jaxexp --batch-size 8 --platforms cpu tpu \
        [--verify] [KEY VALUE ...]

Checkpoint resolution follows the test task (TEST.CHECKPOINT_FILE_PATH >
last in OUTPUT_DIR > TRAIN's); the artifact bakes in weights, cached
label-text features, uint8 preprocessing and the head's eval activation.
``--verify`` deserializes the written bytes and checks scores against the
in-process serving engine on a random clip. Run the artifact anywhere:

    from dist_tpu.serving.export import load_predictor   # or inline the
    predict, meta = load_predictor("k400_b16.jaxexp")     # 30-line loader
    scores = predict(clips_u8)                            # (n, classes)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    ap.add_argument("--verify", action="store_true",
                    help="deserialize the written file and compare scores "
                         "against the in-process engine on a random clip")
    ap.add_argument("opts", nargs=argparse.REMAINDER,
                    help="dotted-key config overrides")
    args = ap.parse_args()

    from dist_tpu.config import load_config
    from dist_tpu.serving.export import (
        export_predictor,
        load_predictor,
        save_exported,
    )

    cfg = load_config(args.cfg, opts=args.opts, make_output_dir=False)
    blob, meta = export_predictor(cfg, batch_size=args.batch_size,
                                  platforms=tuple(args.platforms))
    save_exported(args.out, blob, meta)

    if args.verify:
        import numpy as np

        from dist_tpu.serving.engine import InferenceEngine

        predict, meta2 = load_predictor(args.out)
        rng = np.random.default_rng(0)
        clip = rng.integers(0, 255, (2, meta["num_frames"], meta["crop"],
                                     meta["crop"], 3), dtype=np.uint8)
        got = predict(clip)
        engine = InferenceEngine(cfg, batch_size=args.batch_size)
        want = engine.predict(clip)
        # bf16 configs tolerate mesh-vs-single-device lowering noise
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-3)
        print(f"verify OK: exported scores match the engine "
              f"(shape {got.shape})")


if __name__ == "__main__":
    main()
