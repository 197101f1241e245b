from dist_tpu.data import datasets  # noqa: F401  (registers datasets)
from dist_tpu.data import long_video  # noqa: F401
