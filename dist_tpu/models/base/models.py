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
from typing import Any, Optional

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
class BaseHead(nn.Module):
    """Default classification head: global avg pool -> dropout -> linear ->
    softmax at eval (reference models/base/base_blocks.py:366-436)."""

    num_classes: int = 0
    dropout_rate: float = 0.0
    activation: str = "softmax"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, dict):
            x = x.get("features", x.get("vid_logits"))
        if x.ndim == 5:  # (B, T, H, W, C) feature map
            # fp32 accumulation: the map may be bf16 under MIXED_PRECISION
            x = x.mean(axis=(1, 2, 3), dtype=jnp.float32)
        elif x.ndim > 2:
            x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        feat = x
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        out = nn.Dense(self.num_classes, name="out")(x)
        if not train:
            if self.activation == "softmax":
                out = jax.nn.softmax(out.astype(jnp.float32), axis=-1)
            elif self.activation == "sigmoid":
                out = jax.nn.sigmoid(out.astype(jnp.float32))
        return out, feat


@HEAD_REGISTRY.register()
class BaseHeadx2(nn.Module):
    """Dual verb/noun head for EPIC-KITCHENS
    (reference base_blocks.py:438-506): two linear classifiers over the
    pooled feature; preds is a dict."""

    num_classes: tuple = (0, 0)
    dropout_rate: float = 0.0
    activation: str = "softmax"

    @nn.compact
    def __call__(self, x, train: bool = True):
        if isinstance(x, dict):
            x = x.get("features", x.get("vid_logits"))
        if x.ndim == 5:
            x = x.mean(axis=(1, 2, 3), dtype=jnp.float32)
        feat = x
        if self.dropout_rate > 0:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        outs = {}
        for i, key in enumerate(("verb_class", "noun_class")):
            o = nn.Dense(self.num_classes[i], name=f"out{i + 1}")(x)
            if not train and self.activation == "softmax":
                o = jax.nn.softmax(o.astype(jnp.float32), axis=-1)
            elif not train and self.activation == "sigmoid":
                # same eval-activation contract as the single-task heads
                o = jax.nn.sigmoid(o.astype(jnp.float32))
            outs[key] = o
        return outs, feat


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

    @property
    def _is_clip(self):
        return hasattr(type(self.module), "encode_text")

    def init(self, rng, sample_inputs):
        variables = {}
        video = sample_inputs["video"]
        if hasattr(video, "ndim") and video.ndim == 6:
            # SSL multi-view batches arrive (B, n_views, T, H, W, C); the
            # backbone sees the flattened view axis exactly as in apply()
            video = video.reshape((-1,) + video.shape[2:])
        if self._is_clip:
            ctx_len = self.module.arch.context_length
            tokens = jnp.ones((1, ctx_len), jnp.int32)
            mvars = self.module.init(rng, video, tokens,
                                     method=type(self.module).init_all)
            out = None
        else:
            mvars = self.module.init(rng, video, train=False)
            out = self.module.apply(
                {k: mvars[k] for k in mvars}, video, train=False)
        variables["params"] = mvars["params"]
        if "batch_stats" in mvars:
            variables["batch_stats"] = mvars["batch_stats"]
        if self.head is not None and _head_has_params(self.head):
            if out is None:
                out = self.module.apply({"params": mvars["params"]}, video)
            hv = self.head.init(jax.random.fold_in(rng, 1), out)
            variables["head"] = hv["params"]
            if "batch_stats" in hv:
                # heads with BatchNorm (contrastive projection MLPs with
                # HEAD_BN) carry running stats of their own
                variables["head_stats"] = hv["batch_stats"]
        return variables

    def apply(self, variables, inputs, train=True, rngs=None,
              return_new_state=False):
        """Forward contract ``preds, logits = model(inputs)``
        (reference models/base/models.py:42-45). With BatchNorm backbones and
        ``train=True``, pass ``return_new_state=True`` to also receive the
        updated batch_stats."""
        video = inputs["video"]
        if hasattr(video, "ndim") and video.ndim == 6:
            # (B, n_views, T, H, W, C) -> (B*n, T, H, W, C): the SSL
            # multi-view flatten (reference ContrastiveModel,
            # models/base/models.py:91-104)
            video = video.reshape((-1,) + video.shape[2:])
        mvars = {"params": variables["params"]}
        if "batch_stats" in variables:
            mvars["batch_stats"] = variables["batch_stats"]
        new_stats = {}
        # BN.FREEZE runs BatchNorm on running stats even while training
        # (reference BaseVideoModel.train walks ONLY the BN modules into
        # eval mode, models/base/models.py:60-67). The freeze travels
        # through the bn module's trace-time flag so dropout/stochastic
        # depth keep their train behavior — passing train=False to the
        # whole backbone would silently disable those regularizers too.
        from dist_tpu.models.base.bn import set_bn_frozen
        freeze_bn = bool(self.cfg.BN.get("FREEZE", False)) if self.cfg else False
        set_bn_frozen(freeze_bn)
        if self._is_clip:
            out = self.module.apply(mvars, video,
                                    inputs.get("text_features"), rngs=rngs)
        elif "batch_stats" in mvars and train and not freeze_bn:
            out, updated = self.module.apply(
                mvars, video, train=True, rngs=rngs, mutable=["batch_stats"])
            new_stats["batch_stats"] = updated["batch_stats"]
        else:
            # frozen BN reads running stats via the bn flag; train keeps
            # its true value so dropout/droppath still fire during training
            out = self.module.apply(mvars, video, train=train, rngs=rngs)
        if self.head is None:
            preds, logits = out, out
        else:
            head_vars = {"params": variables.get("head", {})}
            if "head_stats" in variables:
                head_vars["batch_stats"] = variables["head_stats"]
                if train and not freeze_bn:
                    (preds, logits), hupd = self.head.apply(
                        head_vars, out, train=True, rngs=rngs,
                        mutable=["batch_stats"])
                    new_stats["head_stats"] = hupd["batch_stats"]
                else:
                    # BN.FREEZE (or eval): head BN runs on running stats;
                    # BN-carrying heads have no dropout, so train=False is
                    # the frozen-BN flag here
                    preds, logits = self.head.apply(head_vars, out,
                                                    train=False, rngs=rngs)
            else:
                preds, logits = self.head.apply(head_vars, out, train=train,
                                                rngs=rngs)
        new_stats = new_stats or None
        if (self.cfg is not None and self.cfg.MODEL.get("NAME") == "MoSINet"
                and not isinstance(preds, dict)):
            # MoSI pretext task wraps predictions under "move_joint"
            # (reference MoSINet, models/base/models.py:69-88)
            preds = {"move_joint": preds}
        if return_new_state:
            return preds, logits, new_stats
        return preds, logits

    def encode_text(self, variables, tokens):
        return self.module.apply(
            {"params": variables["params"]}, tokens,
            method=type(self.module).encode_text,
        )

    def apply_with_intermediates(self, variables, inputs, train=False):
        """Forward capturing every submodule output — the functional analog
        of the reference's feature-map visualization hooks
        (models/base/base_blocks.py:36-61, cfg.VISUALIZATION.*). Returns
        (preds, intermediates pytree)."""
        video = inputs["video"]
        if hasattr(video, "ndim") and video.ndim == 6:
            # SSL multi-view batches ship (B, n_views, T, H, W, C); the
            # backbone takes rank-5 (same flatten as apply())
            video = video.reshape((-1,) + video.shape[2:])
        from dist_tpu.models.base.bn import set_bn_frozen
        set_bn_frozen(bool(self.cfg.BN.get("FREEZE", False))
                      if self.cfg else False)
        mvars = {"params": variables["params"]}
        if "batch_stats" in variables:
            mvars["batch_stats"] = variables["batch_stats"]
        if self._is_clip:
            out, state = self.module.apply(
                mvars, video, inputs.get("text_features"),
                capture_intermediates=True, mutable=["intermediates"])
        else:
            out, state = self.module.apply(
                mvars, video, train=train,
                capture_intermediates=True, mutable=["intermediates"])
        preds = out
        if self.head is not None:
            head_vars = {"params": variables.get("head", {})}
            if "head_stats" in variables:
                head_vars["batch_stats"] = variables["head_stats"]
            preds, _ = self.head.apply(head_vars, out, train=False)
        return preds, state["intermediates"]


def _head_has_params(head):
    return not isinstance(head, ClipVideoTextIdentity)


def build_head(cfg):
    name = cfg.VIDEO.HEAD.NAME
    if not name:
        return None
    cls = HEAD_REGISTRY.get_strict(name)
    nc = cfg.VIDEO.HEAD.NUM_CLASSES
    common = dict(dropout_rate=float(cfg.VIDEO.HEAD.DROPOUT_RATE or 0.0),
                  activation=cfg.VIDEO.HEAD.ACTIVATION)
    if cls is ClipVideoTextIdentity:
        return cls(activation=cfg.VIDEO.HEAD.ACTIVATION)
    if cls is BaseHeadx2:
        return cls(num_classes=tuple(nc), **common)
    if cls in (BaseHead, ClipVideoHeadLinear):
        return cls(num_classes=int(nc or 0), **common)
    if name == "TransformerHead":
        return cls(num_classes=int(nc or 0),
                   pre_logits=bool(cfg.VIDEO.HEAD.get("PRE_LOGITS", False)),
                   **common)
    if name == "TransformerHeadx2":
        return cls(num_classes=tuple(nc), **common)
    return cls(cfg=cfg)


def build_model(cfg, clip_arch=None) -> VideoModel:
    """Assemble backbone + head (reference models/base/builder.py:19-75;
    DDP/SyncBN/EMA wrapping is replaced by sharded train-step compilation)."""
    import dist_tpu.models  # noqa: F401  (registers all backbones/branches)

    meta_arch = cfg.VIDEO.BACKBONE.META_ARCH
    tpu = cfg.get("TPU") or {}
    pipe = int((tpu.get("MESH") or {}).get("PIPE", 1) or 1)
    assert pipe == 1 or meta_arch == "ClipVisionTextTransformer", (
        f"TPU.MESH.PIPE={pipe} is only wired into the CLIP tower "
        f"(parallel/pipeline.py); {meta_arch} would silently duplicate all "
        "work across the pipe axis — use the data/model axes instead")
    builder = BACKBONE_REGISTRY.get_strict(meta_arch)
    module = builder(cfg) if not isinstance(builder, type) else builder(cfg=cfg)
    head = build_head(cfg)
    return VideoModel(module=module, head=head, cfg=cfg)


@BACKBONE_REGISTRY.register(name="ClipVisionTextTransformer")
def _build_clip_vision_text(cfg):
    """Meta-arch for CLIP(+DiST) models (reference backbone.py:218-257)."""
    from dist_tpu.models.clip.clip_video import clip_dist_from_cfg
    return clip_dist_from_cfg(cfg)
