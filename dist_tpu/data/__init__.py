from dist_tpu.data import datasets  # noqa: F401  (registers datasets)
