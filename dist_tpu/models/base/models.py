"""Model registries + the BaseVideoModel assembly.

Rebuild of the reference's model builder layer (``models/base/models.py``,
``models/base/builder.py:19-75``): a backbone (meta-arch) from
``BACKBONE_REGISTRY`` plus a head from ``HEAD_REGISTRY``, producing the
``preds, logits = model(inputs)`` contract consumed by the task loops.

In the TPU build a "model" is a :class:`VideoModel` record holding a flax
module plus init/apply conveniences; there is no DDP wrapper — data
parallelism happens in the train step's pjit sharding (see
dist_tpu/parallel/mesh.py).
"""

import dataclasses
from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry("Model")
BACKBONE_REGISTRY = Registry("Backbone")
HEAD_REGISTRY = Registry("Head")
STEM_REGISTRY = Registry("Stem")
BRANCH_REGISTRY = Registry("Branch")


@HEAD_REGISTRY.register()
class ClipVideoTextIdentity(nn.Module):
    """DiST's head (reference models/base/base_blocks.py:541-585): mean over
    the view axis of logits_per_image; softmax at eval."""

    activation: str = "softmax"

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = x["logits_per_image"] if isinstance(x, dict) else x
        out = out.mean(axis=1)
        if not train:
            if self.activation == "softmax":
                out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            elif self.activation == "sigmoid":
                out = jax.nn.sigmoid(out.astype(jnp.float32))
        return out, x


@HEAD_REGISTRY.register()
class ClipVideoHeadLinear(nn.Module):
    """Linear classifier over the video embedding (for the no-text CLIP
    path; reference's ClipVideoHeadLinear selection in
    configs/pool/backbone/clip_vit_base_16.yaml)."""

    num_classes: int = 0
    dropout_rate: float = 0.0
    activation: str = "softmax"

    @nn.compact
    def __call__(self, x, train: bool = True):
        feat = x["vid_logits"] if isinstance(x, dict) else x
        feat = feat.mean(axis=1)
        if self.dropout_rate > 0:
            feat = nn.Dropout(self.dropout_rate, deterministic=not train)(feat)
        out = nn.Dense(self.num_classes, name="out")(feat)
        if not train and self.activation == "softmax":
            out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
        return out, feat


@dataclasses.dataclass
class VideoModel:
    """A built model: flax module + conveniences. ``apply`` implements the
    reference forward contract ``preds, logits = model(inputs)``."""

    module: nn.Module
    head: Optional[nn.Module]
    cfg: Any

    def init(self, rng, sample_inputs):
        variables = {}
        video = sample_inputs["video"]
        init_method = getattr(type(self.module), "init_all", None)
        if init_method is not None:
            ctx_len = self.module.arch.context_length
            tokens = jnp.ones((1, ctx_len), jnp.int32)
            params = self.module.init(rng, video, tokens,
                                      method=init_method)["params"]
        else:
            params = self.module.init(rng, video)["params"]
        variables["params"] = params
        if self.head is not None and _head_has_params(self.head):
            # head params initialized from a dummy backbone output
            out = self.module.apply({"params": params}, video)
            hp = self.head.init(jax.random.fold_in(rng, 1), out)["params"]
            variables["head"] = hp
        return variables

    def apply(self, variables, inputs, train=True, rngs=None):
        video = inputs["video"]
        text_features = inputs.get("text_features")
        out = self.module.apply(
            {"params": variables["params"]}, video, text_features, rngs=rngs
        )
        if self.head is None:
            return out, out
        head_vars = {"params": variables.get("head", {})}
        preds, logits = self.head.apply(head_vars, out, train=train, rngs=rngs)
        return preds, logits

    def encode_text(self, variables, tokens):
        return self.module.apply(
            {"params": variables["params"]}, tokens,
            method=type(self.module).encode_text,
        )


def _head_has_params(head):
    return isinstance(head, ClipVideoHeadLinear)


def build_head(cfg):
    name = cfg.VIDEO.HEAD.NAME
    if not name:
        return None
    cls = HEAD_REGISTRY.get_strict(name)
    kwargs = {}
    if cls is ClipVideoHeadLinear:
        kwargs = dict(num_classes=cfg.VIDEO.HEAD.NUM_CLASSES or 0,
                      dropout_rate=float(cfg.VIDEO.HEAD.DROPOUT_RATE or 0.0),
                      activation=cfg.VIDEO.HEAD.ACTIVATION)
    elif cls is ClipVideoTextIdentity:
        kwargs = dict(activation=cfg.VIDEO.HEAD.ACTIVATION)
    else:
        kwargs = dict(cfg=cfg)
    return cls(**kwargs)


def build_model(cfg, clip_arch=None) -> VideoModel:
    """Assemble backbone + head (reference models/base/builder.py:19-75;
    DDP/SyncBN/EMA wrapping is replaced by sharded train-step compilation)."""
    meta_arch = cfg.VIDEO.BACKBONE.META_ARCH
    builder = BACKBONE_REGISTRY.get_strict(meta_arch)
    module = builder(cfg) if not isinstance(builder, type) else builder(cfg=cfg)
    head = build_head(cfg)
    return VideoModel(module=module, head=head, cfg=cfg)


@BACKBONE_REGISTRY.register(name="ClipVisionTextTransformer")
def _build_clip_vision_text(cfg):
    """Meta-arch for CLIP(+DiST) models (reference backbone.py:218-257)."""
    from dist_tpu.models.clip.clip_video import clip_dist_from_cfg
    return clip_dist_from_cfg(cfg)
