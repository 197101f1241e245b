"""On-device (in-jit) augmentation suite.

The TPU analog of the reference's GPU-side augmentations
(``AUGMENTATION.USE_GPU``, dataset/base/base_dataset.py:68,390-392, and the
SSL suite ``RandomColorJitter``/``GaussianBlur``,
sslgenerators/contrastive_learning/augmentations.py:45-501): per-sample
keyed color jitter (brightness/contrast/saturation/hue), random grayscale,
gaussian blur, and horizontal flip — all static-shape, batched over
(B, T, H, W, C) float video inside the jitted train step, where XLA fuses
them into the normalization epilogue (zero extra HBM passes for the
pointwise ops).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# numpy, not jnp: this module may be first imported inside a jit trace, and
# a module-level jnp constant created there would leak a tracer
_RGB2GRAY = np.asarray([0.299, 0.587, 0.114], np.float32)


@dataclasses.dataclass(frozen=True)
class DeviceAugConfig:
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    hue: float = 0.0
    grayscale: float = 0.0
    flip: float = 0.5
    color_p: float = 0.8
    blur_p: float = 0.0
    blur_sigma: float = 1.0

    @classmethod
    def from_cfg(cls, cfg):
        aug = cfg.AUGMENTATION
        # NEVER flip SSV2 on device: its direction-sensitive labels (86/87,
        # 93/94, 166/167) must be remapped together with the flip, which only
        # the host path does (base_dataset.py SSV2_FLIP_LABEL_MAP)
        flip = 0.5
        if "ssv2" in str(cfg.TRAIN.get("DATASET", "")).lower():
            flip = 0.0
        color_p = aug.get("COLOR")  # SSL/simclr gate (reference
        ssl_color = color_p is not None  # augmentations.py:108)
        if color_p is None:
            color_p = aug.get("COLOR_JITTER_P", 0.8)  # supervised key
        # mirror the HOST path's gates exactly (base_dataset._transform):
        # color jitter runs only when COLOR_AUG is on (or the SSL COLOR
        # gate is set) and AutoAugment is not taking its place — USE_GPU
        # must move the SAME augmentations on-device, never add new ones
        autoaug = bool(aug.AUTOAUGMENT.ENABLE) if aug.get("AUTOAUGMENT") \
            else False
        color_on = (ssl_color or bool(aug.get("COLOR_AUG", False))) \
            and not autoaug
        if not color_on:
            return cls(color_p=0.0, flip=flip,
                       blur_p=float(aug.get("BLUR", 0.0) or 0.0))
        return cls(
            brightness=float(aug.BRIGHTNESS), contrast=float(aug.CONTRAST),
            saturation=float(aug.SATURATION), hue=float(aug.HUE),
            grayscale=float(aug.GRAYSCALE),
            color_p=float(color_p or 0.0),
            blur_p=float(aug.get("BLUR", 0.0) or 0.0),
            flip=flip,
        )


def _per_sample(keys, fn, x):
    return jax.vmap(fn)(keys, x)


def _rgb2hsv(x):
    """Shared HSV math (data/transforms.py) with the jnp namespace."""
    from dist_tpu.data.transforms import _rgb2hsv as impl
    return impl(x, xp=jnp)


def _hsv2rgb(h, s, v):
    from dist_tpu.data.transforms import _hsv2rgb as impl
    return impl(h, s, v, xp=jnp)


def color_jitter(rng, video, c: DeviceAugConfig):
    """Clip-consistent color jitter per batch item. video (B,T,H,W,C) in
    [0,1]."""
    b = video.shape[0]
    keys = jax.random.split(rng, b)

    def one(key, x):
        k = jax.random.split(key, 6)
        apply = jax.random.uniform(k[0]) < c.color_p
        f_b = jax.random.uniform(k[1], minval=max(0, 1 - c.brightness),
                                 maxval=1 + c.brightness)
        f_c = jax.random.uniform(k[2], minval=max(0, 1 - c.contrast),
                                 maxval=1 + c.contrast)
        f_s = jax.random.uniform(k[3], minval=max(0, 1 - c.saturation),
                                 maxval=1 + c.saturation)
        h_shift = jax.random.uniform(k[4], minval=-c.hue, maxval=c.hue)

        y = jnp.clip(x * f_b, 0.0, 1.0)
        # per-frame luma mean (reference adjust_contrast dims (-4,-2,-1))
        mean = (y @ _RGB2GRAY).mean(axis=(1, 2))[:, None, None, None]
        y = jnp.clip((y - mean) * f_c + mean, 0.0, 1.0)
        gray = (y @ _RGB2GRAY)[..., None]
        y = jnp.clip((y - gray) * f_s + gray, 0.0, 1.0)
        if c.hue:
            hh, ss, vv = _rgb2hsv(y)
            y = _hsv2rgb(jnp.mod(hh + h_shift, 1.0), ss, vv)
        # the jitter-prob gate covers ONLY the jitter chain; grayscale is an
        # independent draw applied last (reference augmentations.py:142-143)
        y = jnp.where(apply, y, x)
        gray_final = (y @ _RGB2GRAY)[..., None]
        gray3 = jnp.broadcast_to(gray_final, y.shape)
        to_gray = jax.random.uniform(k[5]) < c.grayscale
        y = jnp.where(to_gray, gray3, y)
        return jnp.clip(y, 0.0, 1.0)

    return _per_sample(keys, one, video)


def random_hflip(rng, video, p=0.5):
    b = video.shape[0]
    flip = jax.random.uniform(rng, (b, 1, 1, 1, 1)) < p
    return jnp.where(flip, video[:, :, :, ::-1], video)


def gaussian_blur(rng, video, c: DeviceAugConfig, kernel_size=None):
    """Separable gaussian blur with per-sample random sigma in
    [0.1, blur_sigma*2], applied with prob blur_p (augmentations.py
    GaussianBlur semantics). Kernel defaults to ~10% of the short side
    (odd, >= 3) like the host-path SimCLR blur — shapes are static under
    jit, so this resolves at trace time."""
    if c.blur_p <= 0:
        return video
    b, t, h, w, ch = video.shape
    if kernel_size is None:
        kernel_size = max((min(h, w) // 10) | 1, 3)
    keys = jax.random.split(rng, b)
    half = kernel_size // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)

    def one(key, x):
        k1, k2 = jax.random.split(key)
        sigma = jax.random.uniform(k1, minval=0.1, maxval=2.0 * c.blur_sigma)
        kern = jnp.exp(-(offs ** 2) / (2 * sigma ** 2))
        kern = kern / kern.sum()
        # separable conv over H then W (dims 1,2 of (T,H,W,C))
        y = x
        y = jnp.moveaxis(y, 1, -1)          # (T,W,C,H)
        y = _conv_last(y, kern)
        y = jnp.moveaxis(y, -1, 1)
        y = jnp.moveaxis(y, 2, -1)          # (T,H,C,W)
        y = _conv_last(y, kern)
        y = jnp.moveaxis(y, -1, 2)
        apply = jax.random.uniform(k2) < c.blur_p
        return jnp.where(apply, y, x)

    return _per_sample(keys, one, video)


def _conv_last(x, kern):
    """Convolve the last axis with a 1-D kernel (same padding)."""
    k = kern.shape[0]
    half = k // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad, mode="edge")
    out = jnp.zeros_like(x)
    for i in range(k):
        out = out + kern[i] * jax.lax.dynamic_slice_in_dim(
            xp, i, x.shape[-1], axis=x.ndim - 1)
    return out


def device_augment(rng, video, c: DeviceAugConfig):
    """Full device-side augmentation chain on [0,1] float video."""
    k1, k2, k3 = jax.random.split(rng, 3)
    video = random_hflip(k1, video, c.flip)
    if c.brightness or c.contrast or c.saturation or c.hue or c.grayscale:
        video = color_jitter(k2, video, c)
    video = gaussian_blur(k3, video, c)
    return video
