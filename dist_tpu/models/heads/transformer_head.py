"""Transformer classification heads
(reference models/module_zoo/heads/transformer_head.py:16-148)."""

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.base.models import HEAD_REGISTRY


@HEAD_REGISTRY.register()
class TransformerHead(nn.Module):
    """Optional tanh pre-logits + linear (transformer_head.py:16-74)."""

    num_classes: int = 0
    dropout_rate: float = 0.0
    activation: str = "softmax"
    pre_logits: bool = False

    @nn.compact
    def __call__(self, x, train=True):
        if isinstance(x, dict):
            x = x.get("features", x.get("vid_logits"))
        feat = x
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.pre_logits:
            x = jnp.tanh(nn.Dense(x.shape[-1], name="pre_logits_fc")(x))
        out = nn.Dense(self.num_classes, name="linear")(x)
        if not train:
            if self.activation == "softmax":
                out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            elif self.activation == "sigmoid":
                out = jax.nn.sigmoid(out.astype(jnp.float32))
        return out, feat


@HEAD_REGISTRY.register()
class TransformerHeadx2(nn.Module):
    """Dual verb/noun transformer head (transformer_head.py:77-148)."""

    num_classes: Tuple[int, int] = (0, 0)
    dropout_rate: float = 0.0
    activation: str = "softmax"

    @nn.compact
    def __call__(self, x, train=True):
        if isinstance(x, dict):
            x = x.get("features", x.get("vid_logits"))
        feat = x
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        outs = {}
        for i, key in enumerate(("verb_class", "noun_class")):
            o = nn.Dense(self.num_classes[i], name=f"linear{i + 1}")(x)
            if not train and self.activation == "softmax":
                o = jax.nn.softmax(o.astype(jnp.float32), axis=-1)
            elif not train and self.activation == "sigmoid":
                # same eval-activation contract as the single-task heads
                o = jax.nn.sigmoid(o.astype(jnp.float32))
            outs[key] = o
        return outs, feat
