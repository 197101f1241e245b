#!/usr/bin/env python3
"""Serve a trained model over HTTP (micro-batched TPU inference).

Usage:
  PYTHONPATH=. python tools/serve.py --cfg configs/projects/dist/k400/vit-b16-8+16f-eval.yaml \
      [--port 8080] [--batch 8] [--max-delay-ms 10] [KEY VALUE ...]

Send clips as .npy bytes (uint8 (T, S, S, 3)):
  python - <<'PY'
  import io, urllib.request, numpy as np
  clip = np.zeros((8, 224, 224, 3), np.uint8)
  buf = io.BytesIO(); np.save(buf, clip)
  req = urllib.request.Request("http://localhost:8080/v1/predict?topk=5",
                               data=buf.getvalue(), method="POST")
  print(urllib.request.urlopen(req).read().decode())
  PY

Checkpoint resolution follows the test task (TEST.CHECKPOINT_FILE_PATH >
last train checkpoint > TRAIN.CHECKPOINT_FILE_PATH); torch checkpoints
convert at load. Endpoints: POST /v1/predict, GET /v1/health, /v1/stats.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--batch", type=int, default=None,
                    help="serving batch (static compile shape); "
                         "default TEST.BATCH_SIZE")
    ap.add_argument("--max-delay-ms", type=float, default=10.0,
                    help="micro-batching latency budget")
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    from dist_tpu.config import load_config
    from dist_tpu.serving.server import VideoClassifierServer

    cfg = load_config(args.cfg, opts=list(args.opts), make_output_dir=False)
    server = VideoClassifierServer(cfg, host=args.host, port=args.port,
                                   batch_size=args.batch,
                                   max_delay_ms=args.max_delay_ms)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
