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

_BN_FROZEN = False


def set_bn_frozen(flag):
    global _BN_FROZEN
    _BN_FROZEN = bool(flag)


def bn_running(train):
    """``use_running_average`` for a BatchNorm given the caller's train
    flag and the global freeze."""
    return (not train) or _BN_FROZEN
