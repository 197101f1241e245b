from dist_tpu.ssl import generator  # noqa: F401  (registers generators)
