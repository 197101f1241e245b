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

    def _crop_scale(self):
        """RandomResizedCrop area range from TRAIN_JITTER_SCALES exactly as
        the reference computes it (contrastive_generator.py:58-63:
        ``s^2 / 256 / 340``; simclr's [168, 224] -> (0.324, 0.576))."""
        s0, s1 = self.cfg.DATA.TRAIN_JITTER_SCALES
        return (s0 * s0 / 256.0 / 340.0, s1 * s1 / 256.0 / 340.0)

    def __call__(self, frames_list, labels, rng):
        """frames_list: list of decoded clips (T,H,W,3) uint8 (one per
        requested clip) OR a single clip reused for each view.
        Returns (views (n, T, S, S, 3) uint8, labels dict).

        Per-view chain mirrors the reference transform Compose
        (contrastive_generator.py:51-87 + RandomColorJitter,
        augmentations.py:98-147): crop -> COLOR-gated jitter -> blur ->
        grayscale (last) -> flip. Photometric ops move into the jitted
        train step when AUGMENTATION.USE_GPU (ops/augment_device.py)."""
        cfg = self.cfg
        use_gpu = bool(cfg.AUGMENTATION.get("USE_GPU"))
        views = []
        for i in range(self.num_views):
            frames = frames_list[i % len(frames_list)]
            v = transforms.random_resized_crop(
                frames, self.crop_size,
                scale=self._crop_scale(),
                ratio=tuple(cfg.AUGMENTATION.RATIO), rng=rng)
            if not use_gpu:
                v = transforms.color_jitter_clip(
                    v, rng,
                    brightness=cfg.AUGMENTATION.BRIGHTNESS,
                    contrast=cfg.AUGMENTATION.CONTRAST,
                    saturation=cfg.AUGMENTATION.SATURATION,
                    hue=cfg.AUGMENTATION.HUE,
                    grayscale=0.0,  # applied after the blur, below
                    consistent=bool(cfg.AUGMENTATION.get("CONSISTENT", True)),
                    shuffle=bool(cfg.AUGMENTATION.get("SHUFFLE", True)),
                    p=float(cfg.AUGMENTATION.get("COLOR", 0.8) or 0.0))
                blur_p = float(cfg.AUGMENTATION.get("BLUR", 0.0) or 0.0)
                if blur_p > 0 and rng.uniform() < blur_p:
                    # SimCLR blur (the reference constructs an identity
                    # kernel_size=1 blur here — see gaussian_blur_clip)
                    v = transforms.gaussian_blur_clip(v, rng)
                gray_p = float(cfg.AUGMENTATION.GRAYSCALE or 0.0)
                if gray_p > 0 and rng.uniform() < gray_p:
                    g = (v.astype(np.float32)
                         @ np.asarray([0.299, 0.587, 0.114], np.float32))
                    v = np.repeat(g[..., None], 3, axis=-1).astype(np.uint8)
            if rng.uniform() < 0.5:
                v = transforms.horizontal_flip(v)
            views.append(np.ascontiguousarray(v))
        labels = dict(labels)
        labels["self-supervised"] = {
            "contrastive": np.arange(self.num_views, dtype=np.int64)}
        return np.stack(views), labels
