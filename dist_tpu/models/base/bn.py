"""BatchNorm freeze control (reference BaseVideoModel.train's BN-only
eval-mode walk, models/base/models.py:60-67).

``BN.FREEZE`` must put ONLY BatchNorm on running stats while the rest of
the network keeps training behavior (dropout, stochastic depth). Passing
``train=False`` to the whole backbone would silently disable those
regularizers too, so the freeze travels through this trace-time flag
instead: ``VideoModel.apply`` sets it from the config before tracing, and
every BatchNorm site computes its ``use_running_average`` through
:func:`bn_running`. The flag is static per jitted step (read at trace
time), exactly like the config it mirrors.
"""

import contextvars

# ContextVar, not a module global: each thread (and each context) sees its
# own value, so two models traced concurrently with different BN.FREEZE
# settings (e.g. a frozen-BN fine-tune plus a serving engine build) cannot
# cross-contaminate each other's traces.
_BN_FROZEN = contextvars.ContextVar("dist_tpu_bn_frozen", default=False)


def set_bn_frozen(flag):
    _BN_FROZEN.set(bool(flag))


def bn_running(train):
    """``use_running_average`` for a BatchNorm given the caller's train
    flag and the freeze state."""
    return (not train) or _BN_FROZEN.get()
