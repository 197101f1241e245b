"""BMN-style temporal-action-localization head.

The reference ships the BMN losses (models/utils/localization_losses.py),
the proposal decoding (utils/tal_tools.py:67-139), and the TAL backbone
(SimpleLocalizationConv) but no head module; this completes the path with
the standard Boundary-Matching Network outputs:

    start (B, T), end (B, T)                  — boundary probabilities
    confidence_map (B, 2, D, T)               — [regression, classification]
                                                confidence per (duration,
                                                start) proposal

TPU-first: the boundary-matching feature (mean of the snippet features over
each proposal window) is computed with ONE cumulative sum and static
slicing — no sampling-mask matmul, no dynamic shapes.
"""

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import HEAD_REGISTRY


def proposal_window_means(x, dscale):
    """x (B, T, C) -> (B, D, T, C): mean of x[t : t+d+1] per (d, t) with
    zero padding past the end (cumsum + static shifts)."""
    b, t, c = x.shape
    cs = jnp.concatenate(
        [jnp.zeros((b, 1, c), x.dtype), jnp.cumsum(x, axis=1)], axis=1)
    outs = []
    for d in range(dscale):
        w = d + 1
        hi = jnp.concatenate(
            [cs[:, w:], jnp.repeat(cs[:, -1:], min(w, t), axis=1)], axis=1)[:, :t]
        means = (hi - cs[:, :t]) / w
        # windows that run past the end are invalid -> zero
        valid = (jnp.arange(t) + w) <= t
        outs.append(means * valid[None, :, None])
    return jnp.stack(outs, axis=1)  # (B, D, T, C)


@HEAD_REGISTRY.register()
class BMNHead(nn.Module):
    """TEM boundary branches + PEM proposal confidence branch."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        # x: (B, T, C) snippet features from SimpleLocalizationConv
        if isinstance(x, dict):
            x = x.get("features", x)
        hidden = int(self.cfg.VIDEO.get("DIM1D", x.shape[-1]))
        dscale = int(self.cfg.LOCALIZATION.get("DSCALE",
                                               x.shape[1]))

        def tem_branch(name):
            h = nn.Conv(hidden, (3,), padding=((1, 1),), name=f"{name}_conv1")(x)
            h = nn.relu(h)
            h = nn.Conv(1, (1,), name=f"{name}_conv2")(h)
            return jax.nn.sigmoid(h[..., 0].astype(jnp.float32))

        start = tem_branch("start")
        end = tem_branch("end")

        pem = proposal_window_means(x, dscale)            # (B, D, T, C)
        h = nn.Dense(hidden, name="pem_fc1")(pem)
        h = nn.relu(h)
        h = nn.Conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                    name="pem_conv")(h)
        h = nn.relu(h)
        conf = nn.Dense(2, name="pem_fc2")(h)             # (B, D, T, 2)
        confidence = jax.nn.sigmoid(
            jnp.moveaxis(conf, -1, 1).astype(jnp.float32))  # (B, 2, D, T)

        preds = {"start": start, "end": end, "confidence_map": confidence}

        nc = self.cfg.VIDEO.HEAD.get("NUM_CLASSES")
        if isinstance(nc, (list, tuple)) and len(nc) == 2:
            # EPIC-KITCHENS detection: per-proposal verb/noun classification
            # maps (the reference's BMN outputs carry verb_map/noun_map,
            # consumed by parse_epic_bmn_proposals, utils/tal_tools.py:67-136)
            for name, n in (("verb", int(nc[0])), ("noun", int(nc[1]))):
                logits = nn.Dense(n, name=f"{name}_map_fc")(h)  # (B,D,T,n)
                preds[f"{name}_map"] = jax.nn.softmax(
                    jnp.moveaxis(logits, -1, 1).astype(jnp.float32), axis=1)
        return preds, x
