"""TAL feature backbone (reference models/base/backbone.py:180-215):
a 1-D conv stack over precomputed per-snippet features."""

from typing import Any

import flax.linen as nn

from dist_tpu.models.base.models import BACKBONE_REGISTRY


@BACKBONE_REGISTRY.register()
class SimpleLocalizationConv(nn.Module):
    """Input (B, T, C_feat) snippet features -> (B, T, DIM1D)."""

    cfg: Any

    @nn.compact
    def __call__(self, x, train=True):
        if isinstance(x, dict):
            x = x["video"]
        hidden = int(self.cfg.VIDEO.DIM1D)
        layers = int(self.cfg.VIDEO.BACKBONE_LAYER)
        groups = int(self.cfg.VIDEO.get("BACKBONE_GROUPS_NUM", 1))
        for i in range(layers):
            g = groups if x.shape[-1] % groups == 0 else 1
            x = nn.Conv(hidden, (3,), padding=((1, 1),),
                        feature_group_count=g, name=f"conv{i}")(x)
            x = nn.relu(x)
        return x
