"""Device-side Mixup/CutMix (reference dataset/utils/mixup.py:13-319).

Runs *inside* the jitted train step on TPU (the reference mixes on GPU in
the train loop, runs/train.py:99-100). Batch mode: one Beta-sampled lambda
per batch, mixed with the flipped batch; CutMix replaces a random box and
corrects lambda by the true box area; targets become smoothed one-hot
mixes. The box is applied with a static-shape coordinate mask (no dynamic
shapes under jit).
"""

import dataclasses

import jax
import jax.numpy as jnp

from dist_tpu.optim.losses import label_smoothing


@dataclasses.dataclass(frozen=True)
class MixupConfig:
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    cutmix_minmax: tuple = None  # min/max bbox ratio; overrides alpha-lam
    mix_prob: float = 1.0
    switch_prob: float = 0.5
    smoothing: float = 0.1
    num_classes: int = 0
    mode: str = "batch"

    @classmethod
    def from_cfg(cls, cfg):
        aug = cfg.AUGMENTATION
        minmax = aug.CUTMIX.get("MINMAX") if aug.CUTMIX.ENABLE else None
        minmax = tuple(float(v) for v in minmax) if minmax else None
        cutmix_alpha = float(aug.CUTMIX.ALPHA) if aug.CUTMIX.ENABLE else 0.0
        if minmax is not None and cutmix_alpha <= 0:
            # timm Mixup: a minmax range activates cutmix regardless of alpha
            # (reference mixup.py:131-135 forces cutmix_alpha = 0.5)
            cutmix_alpha = 0.5
        return cls(
            mixup_alpha=float(aug.MIXUP.ALPHA),
            cutmix_alpha=cutmix_alpha,
            cutmix_minmax=minmax,
            mix_prob=float(aug.MIXUP.PROB),
            switch_prob=float(aug.MIXUP.SWITCH_PROB),
            smoothing=float(aug.LABEL_SMOOTHING),
            num_classes=int(cfg.VIDEO.HEAD.NUM_CLASSES),
            mode=aug.MIXUP.MODE,
        )

    @property
    def enabled(self):
        return self.mixup_alpha > 0 or self.cutmix_alpha > 0


def _rand_bbox_mask(rng, h, w, lam):
    """CutMix square box of area ~(1-lam); returns (mask[h,w], corrected lam)
    (reference rand_bbox + cutmix_bbox_and_lam, mixup.py:44-104)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    yl = jnp.clip(cy - cut_h // 2, 0, h)
    yh = jnp.clip(cy + cut_h // 2, 0, h)
    xl = jnp.clip(cx - cut_w // 2, 0, w)
    xh = jnp.clip(cx + cut_w // 2, 0, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = ((rows >= yl) & (rows < yh) & (cols >= xl) & (cols < xh))
    area = (yh - yl) * (xh - xl)
    lam_corrected = 1.0 - area / float(h * w)
    return mask, lam_corrected


def _rand_bbox_minmax_mask(rng, h, w, minmax):
    """Darknet-style min-max CutMix box: each side drawn independently as a
    fraction of the image in [minmax[0], minmax[1]); lambda is fully
    determined by the box area (reference rand_bbox_minmax +
    cutmix_bbox_and_lam, mixup.py:68-104)."""
    kh, kw, ky, kx = jax.random.split(rng, 4)
    cut_h = jax.random.randint(kh, (), int(h * minmax[0]), int(h * minmax[1]))
    cut_w = jax.random.randint(kw, (), int(w * minmax[0]), int(w * minmax[1]))
    yl = jax.random.randint(ky, (), 0, h - cut_h)
    xl = jax.random.randint(kx, (), 0, w - cut_w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    mask = ((rows >= yl) & (rows < yl + cut_h)
            & (cols >= xl) & (cols < xl + cut_w))
    lam = 1.0 - (cut_h * cut_w) / float(h * w)
    return mask, lam


def mixup_batch(rng, video, labels, mc: MixupConfig):
    """video (B, T, H, W, C) float; labels (B,) int.
    Returns (mixed_video, soft_targets (B, num_classes))."""
    assert mc.mode == "batch", f"mixup mode {mc.mode} not implemented yet"
    b, t, h, w, c = video.shape
    k_use, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)

    use_mix = jax.random.uniform(k_use) < mc.mix_prob
    both = mc.mixup_alpha > 0 and mc.cutmix_alpha > 0
    if both:
        use_cutmix = jax.random.uniform(k_switch) < mc.switch_prob
    else:
        use_cutmix = jnp.asarray(mc.cutmix_alpha > 0)

    lam_mix = (jax.random.beta(k_lam_m, mc.mixup_alpha, mc.mixup_alpha)
               if mc.mixup_alpha > 0 else jnp.float32(1.0))
    lam_cut = (jax.random.beta(k_lam_c, mc.cutmix_alpha, mc.cutmix_alpha)
               if mc.cutmix_alpha > 0 else jnp.float32(1.0))

    if mc.cutmix_minmax is not None:
        mask, lam_cut = _rand_bbox_minmax_mask(k_box, h, w, mc.cutmix_minmax)
    else:
        mask, lam_cut = _rand_bbox_mask(k_box, h, w, lam_cut)
    flipped = video[::-1]

    mixed_mixup = video * lam_mix + flipped * (1.0 - lam_mix)
    mask_b = mask[None, None, :, :, None]
    mixed_cutmix = jnp.where(mask_b, flipped, video)

    mixed = jnp.where(use_cutmix, mixed_cutmix, mixed_mixup)
    lam = jnp.where(use_cutmix, lam_cut, lam_mix)

    mixed = jnp.where(use_mix, mixed, video)
    lam = jnp.where(use_mix, lam, 1.0)

    y1 = label_smoothing(labels, mc.num_classes, mc.smoothing)
    y2 = label_smoothing(labels[::-1], mc.num_classes, mc.smoothing)
    target = y1 * lam + y2 * (1.0 - lam)
    return mixed.astype(video.dtype), target
