from dist_tpu.optim import contrastive  # noqa: F401  (registers SSL losses)
from dist_tpu.optim import localization  # noqa: F401  (registers TAL losses)
