"""Production serving: micro-batching inference engine + HTTP front-end.

The reference ships no serving path (its ``runs/test.py`` is a dataset
evaluator); this package is the deployment story the TPU rebuild adds:

- :mod:`engine`   — config -> compiled fixed-shape eval fn + checkpoint
- :mod:`batcher`  — cross-request micro-batching with a latency deadline
- :mod:`server`   — stdlib HTTP server exposing /v1/predict|health|stats
"""

from dist_tpu.serving.batcher import MicroBatcher  # noqa: F401
from dist_tpu.serving.engine import InferenceEngine  # noqa: F401
