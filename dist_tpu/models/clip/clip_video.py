"""CLIP + DiST video model assembly.

Functional rebuild of the reference's ``CLIP`` wrapper with an embedded
``DiSTNetwork`` (``models/base/clip.py:303-533``) and the
``ClipVisionTextTransformer`` meta-arch (``models/base/backbone.py:218-257``).

Differences by design:

- **Text caching is explicit dataflow.** The reference memoizes label-text
  features on the module (``cache_text``, clip.py:437-452). Here the task
  loop calls :meth:`CLIPDiSTModel.encode_text` once (its own jit) and passes
  the resulting ``(num_classes, embed_dim)`` array into every step — no
  hidden state, checkpoint-friendly, and jit-stable.
- **Freezing is stop_gradient, not no_grad.** With the tower output wrapped
  in ``jax.lax.stop_gradient``, XLA prunes the tower's entire backward
  graph; the reference needed ``torch.no_grad`` plus DDP
  ``find_unused_parameters=True`` (models/base/builder.py:73).
- Video layout is (B, T, H, W, 3) channels-last throughout.
"""

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from dist_tpu.models.clip.model import (
    ARCHITECTURES,
    CLIPArchitecture,
    TextTransformer,
    VisionTransformer,
)
from dist_tpu.models.dist.dist_net import DiSTConfig, DiSTNetwork


class CLIPDiSTModel(nn.Module):
    """CLIP towers + (optionally) the DiST side network.

    __call__(video, text_features) -> dict with:
      logits_per_image (B, 1, num_classes) — cosine-sim classifier over the
        cached label-text features, scaled by exp(logit_scale)
        (clip.py:509-527), reshaped with the view axis the head means over
        (backbone.py:236-241);
      vid_logits (B, 1, embed_dim) — the video embedding.
    """

    arch: CLIPArchitecture
    dist: Optional[DiSTConfig] = None
    num_frames: int = 16
    sparse_alpha: int = 1
    freeze_visual: bool = True
    freeze_text: bool = True
    # zero-shot / prediction fusion (clip.py:519-527): blend the DiST
    # classifier with the frozen CLIP frame-embedding classifier
    prediction_fusion: bool = False
    fusion_weight: float = 0.5
    dtype: jnp.dtype = jnp.float32

    remat: bool = False
    ladder_unroll: int = -1  # -1 = full unroll (see DiSTNetwork.unroll)
    fused_temporal: bool = False  # TPU.FUSED_TEMPORAL_NET (ops/temporal_net.py)
    pipe_stages: int = 1        # TPU.MESH.PIPE (parallel/pipeline.py)
    pipe_microbatches: int = 0  # TPU.PIPE_MICROBATCHES

    def setup(self):
        self.visual = VisionTransformer(
            arch=self.arch, num_frames=self.num_frames,
            sparse_alpha=self.sparse_alpha, dtype=self.dtype,
            remat=self.remat, pipe_stages=self.pipe_stages,
            pipe_microbatches=self.pipe_microbatches, name="visual",
        )
        self.text = TextTransformer(arch=self.arch, dtype=self.dtype, name="text")
        if self.dist is not None:
            self.dist_net = DiSTNetwork(
                cfg=self.dist, d_model=self.arch.vision_width,
                output_dim=self.arch.embed_dim, dtype=self.dtype,
                remat=self.remat, unroll=self.ladder_unroll,
                fused_temporal=self.fused_temporal, name="dist_net",
            )
        self.logit_scale = self.param(
            "logit_scale",
            lambda key, shape: jnp.full(shape, jnp.log(1.0 / 0.07)), (),
        )

    def init_all(self, video, tokens):
        """Init-time tracing path: touches both towers (+ DiST) so a single
        ``module.init`` creates every parameter."""
        out = self.__call__(video, None)
        tf = self.encode_text(tokens)
        return out, tf

    def encode_text(self, tokens):
        """Label-prompt features (num_classes, embed_dim); run once and cache
        host-side (the functional analog of clip.py:437-452)."""
        feats, _ = self.text(tokens)
        if self.freeze_text:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def encode_video(self, video):
        """video (B, T, H, W, 3) -> per-video embedding (B, embed_dim)."""
        # the tower keeps ceil(T/alpha) frames via x[:, ::alpha] while every
        # downstream reshape uses floor(T/alpha) — non-divisible alpha would
        # silently regroup rows across videos (or crash); fail loudly
        assert video.shape[1] % self.sparse_alpha == 0, (
            f"NUM_INPUT_FRAMES ({video.shape[1]}) must be divisible by "
            f"SPARSE_SAMPLE_ALPHA ({self.sparse_alpha})")
        cls_x, x_logits, taps = self.visual(
            video, collect_taps=self.dist is not None
        )
        if self.freeze_visual:
            cls_x = jax.lax.stop_gradient(cls_x)
            x_logits = jax.lax.stop_gradient(x_logits)
            if taps is not None:
                taps = jax.lax.stop_gradient(taps)
        if self.dist is None:
            # plain CLIP video path: mean over frames of the cls embedding
            t = self.num_frames // self.sparse_alpha
            return cls_x.reshape(-1, t, cls_x.shape[-1]).mean(axis=1), cls_x
        sel = jnp.asarray(self.dist.selected_layers)
        video_emb = self.dist_net(video, taps[sel])
        return video_emb, cls_x

    def __call__(self, video, text_features=None):
        video_emb, frame_cls = self.encode_video(video)
        if text_features is None:
            return {"vid_logits": video_emb[:, None, :],
                    "img_logits": frame_cls,
                    "logits_per_image": None}
        v = video_emb.astype(jnp.float32)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
        tf = text_features.astype(jnp.float32)
        tf = tf / jnp.maximum(jnp.linalg.norm(tf, axis=-1, keepdims=True), 1e-6)
        logit_scale = jnp.exp(self.logit_scale.astype(jnp.float32))
        logits_per_image = logit_scale * v @ tf.T
        if self.prediction_fusion:
            # zero-shot logits from the frozen per-frame cls embeddings,
            # mean-pooled over frames (clip.py:519-527)
            f = frame_cls.astype(jnp.float32)
            f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-6)
            zs = (logit_scale * f @ tf.T).reshape(
                logits_per_image.shape[0], -1, tf.shape[0]).mean(axis=1)
            w = self.fusion_weight
            logits_per_image = logits_per_image * w + zs * (1.0 - w)
        return {
            "logits_per_image": logits_per_image[:, None, :],
            "vid_logits": video_emb[:, None, :],
            "img_logits": frame_cls,
        }


def clip_dist_from_cfg(cfg, arch: Optional[CLIPArchitecture] = None):
    """Build the model definition from a global Config (+ optional sniffed
    architecture; falls back to the named preset META_ARCH_NAME)."""
    if arch is None:
        name = cfg.VIDEO.BACKBONE.META_ARCH_NAME
        assert name in ARCHITECTURES, (
            f"unknown CLIP architecture {name!r}; provide a checkpoint to "
            f"sniff from or one of {sorted(ARCHITECTURES)}")
        arch = ARCHITECTURES[name]
    atten_block = cfg.VIDEO.BACKBONE.get("ATTEN_BLOCK", "")
    assert atten_block in ("", "ResidualAttentionBlock",
                           "ResidualAttentionBlockMid"), (
        f"unknown ATTEN_BLOCK {atten_block!r}: the reference's "
        "ATTEN_BLOCK_REGISTRY (clip.py:39-40,204-212) carries only "
        "ResidualAttentionBlockMid; here both names map onto the single "
        "scanned block whose mid-feature taps ride the scan ys "
        "(docs/CONFIG_KEYS.md)")
    use_bf16 = bool(cfg.TRAIN.get("MIXED_PRECISION", False)
                    or cfg.TRAIN.get("HALF_PRECISION", False))
    dist = None
    if cfg.VIDEO.BACKBONE.get("DIST") and cfg.VIDEO.BACKBONE.DIST.ENABLE:
        dist = DiSTConfig.from_cfg(cfg)
    zeroshot = bool(cfg.TEST.get("ZEROSHOT") and cfg.TEST.ZEROSHOT.ENABLE)
    tpu = cfg.get("TPU") or {}
    mesh_cfg = tpu.get("MESH") or {}
    if bool(tpu.get("FUSED_TEMPORAL_NET", False)):
        # the fused Pallas kernel carries no GSPMD partitioning rule: under
        # a multi-device mesh the custom call would fail to partition or
        # silently replicate the batch-sharded operand per chip. (On
        # non-TPU backends the op falls back to shardable jnp code, so
        # CPU-mesh tests/dryruns are unaffected.)
        import jax
        assert (jax.default_backend() not in ("tpu", "axon")
                or jax.device_count() == 1), (
            "TPU.FUSED_TEMPORAL_NET is single-chip only (the Pallas kernel "
            "has no sharding rule); disable it for multi-chip meshes — the "
            "unfused ladder is the faster formulation anyway "
            "(assets/fused_temporal_net_v5e.json)")
    return CLIPDiSTModel(
        prediction_fusion=zeroshot,
        remat=bool(cfg.get("TPU") and cfg.TPU.get("REMAT", False)),
        ladder_unroll=int((cfg.get("TPU") or {}).get("LADDER_UNROLL", -1)
                          if cfg.get("TPU") else -1),
        pipe_stages=int(mesh_cfg.get("PIPE", 1) or 1),
        fused_temporal=bool(tpu.get("FUSED_TEMPORAL_NET", False)),
        pipe_microbatches=int(tpu.get("PIPE_MICROBATCHES", 0) or 0),
        arch=arch,
        dist=dist,
        num_frames=cfg.DATA.NUM_INPUT_FRAMES,
        sparse_alpha=int(cfg.DATA.get("SPARSE_SAMPLE_ALPHA", 1)),
        freeze_visual=bool(cfg.VIDEO.BACKBONE.get("FREEZE_VISUAL", False)),
        freeze_text=bool(cfg.VIDEO.BACKBONE.get("FREEZE_TEXT", False)),
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
    )
