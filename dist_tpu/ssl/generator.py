"""SSL view generators (reference sslgenerators/).

``ContrastiveGenerator`` (sslgenerators/contrastive_learning/
contrastive_generator.py:17-100): per clip, produce N independently
augmented views (random resized crop + flip + color jitter + grayscale +
normalize-ready uint8), labels ``{"contrastive": arange(n_clips)}``.

Augmentations run host-side on uint8 numpy (the device normalizes); the
heavier photometric ops reuse dist_tpu.data.transforms.
"""

import numpy as np

from dist_tpu.data import transforms
from dist_tpu.utils.registry import Registry

SSL_GENERATOR_REGISTRY = Registry("SSLGenerator")


def build_ssl_generator(cfg, split):
    """(reference sslgenerators/builder.py:10)"""
    name = cfg.PRETRAIN.GENERATOR
    return SSL_GENERATOR_REGISTRY.get_strict(name)(cfg, split)


@SSL_GENERATOR_REGISTRY.register()
class ContrastiveGenerator:
    def __init__(self, cfg, split):
        self.cfg = cfg
        self.split = split
        self.num_views = int(cfg.PRETRAIN.get("NUM_CLIPS_PER_VIDEO", 2))
        self.crop_size = int(cfg.DATA.TRAIN_CROP_SIZE)

    def __call__(self, frames_list, labels, rng):
        """frames_list: list of decoded clips (T,H,W,3) uint8 (one per
        requested clip) OR a single clip reused for each view.
        Returns (views (n, T, S, S, 3) uint8, labels dict)."""
        cfg = self.cfg
        views = []
        for i in range(self.num_views):
            frames = frames_list[i % len(frames_list)]
            v = transforms.random_resized_crop(
                frames, self.crop_size,
                scale=(0.2, 1.0), ratio=tuple(cfg.AUGMENTATION.RATIO), rng=rng)
            if rng.uniform() < 0.5:
                v = transforms.horizontal_flip(v)
            blur_p = float(cfg.AUGMENTATION.get("BLUR", 0.0) or 0.0)
            if blur_p > 0 and rng.uniform() < blur_p:
                # SimCLR blur (the reference constructs an identity
                # kernel_size=1 blur here — see gaussian_blur_clip)
                v = transforms.gaussian_blur_clip(v, rng)
            v = transforms.color_jitter_clip(
                v, rng,
                brightness=cfg.AUGMENTATION.BRIGHTNESS,
                contrast=cfg.AUGMENTATION.CONTRAST,
                saturation=cfg.AUGMENTATION.SATURATION,
                hue=cfg.AUGMENTATION.HUE,
                grayscale=cfg.AUGMENTATION.GRAYSCALE,
                consistent=bool(cfg.AUGMENTATION.get("CONSISTENT", False)),
                shuffle=bool(cfg.AUGMENTATION.get("SHUFFLE", True)),
                gray_first=bool(cfg.AUGMENTATION.get("GRAY_FIRST", True)),
                p=float(cfg.AUGMENTATION.get("COLOR_JITTER_P", 1.0) or 0.8))
            views.append(np.ascontiguousarray(v))
        labels = dict(labels)
        labels["self-supervised"] = {
            "contrastive": np.arange(self.num_views, dtype=np.int64)}
        return np.stack(views), labels
