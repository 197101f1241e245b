"""RandAugment for video clips (reference dataset/utils/auto_augment.py, the
timm port; factory string ``rand-mN-nK-mstdS-incZ`` parsed like
``creat_auto_augmentation``, auto_augment.py:714).

Fresh numpy/cv2 implementation over uint8 (T, H, W, C) clips with
clip-consistent magnitudes (every frame of a clip gets the same ops —
matching the reference's per-clip PIL loop with shared params).
"""

import numpy as np

_MAX_LEVEL = 10.0


def _blend(a, b, alpha):
    return np.clip(a.astype(np.float32) * alpha
                   + b.astype(np.float32) * (1 - alpha), 0, 255).astype(np.uint8)


def _autocontrast(x, _):
    lo = x.min(axis=(0, 1, 2), keepdims=True).astype(np.float32)
    hi = x.max(axis=(0, 1, 2), keepdims=True).astype(np.float32)
    scale = 255.0 / np.maximum(hi - lo, 1)
    return np.clip((x - lo) * scale, 0, 255).astype(np.uint8)


def _equalize(x, _):
    import cv2
    out = np.empty_like(x)
    for t in range(x.shape[0]):
        for c in range(x.shape[-1]):
            out[t, :, :, c] = cv2.equalizeHist(x[t, :, :, c])
    return out


def _invert(x, _):
    return 255 - x


def _rotate(x, level):
    import cv2
    deg = (level / _MAX_LEVEL) * 30.0
    if np.random.uniform() > 0.5:
        deg = -deg
    t, h, w, c = x.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _posterize(x, level):
    bits = max(min(8 - int((level / _MAX_LEVEL) * 4), 8), 1)
    mask = 256 - (1 << (8 - bits))
    return (x & mask).astype(np.uint8)


def _solarize(x, level):
    thr = int(256 - (level / _MAX_LEVEL) * 256)
    return np.where(x >= thr, 255 - x, x).astype(np.uint8)


def _color(x, level):
    gray = (x @ np.asarray([0.299, 0.587, 0.114], np.float32))[..., None]
    return _blend(x, np.repeat(gray, 3, axis=-1), _enhance_factor(level))


def _contrast(x, level):
    mean = x.astype(np.float32).mean(keepdims=True)
    return _blend(x, np.full_like(x, int(mean)), _enhance_factor(level))


def _brightness(x, level):
    return _blend(x, np.zeros_like(x), _enhance_factor(level))


def _sharpness(x, level):
    import cv2
    t = x.shape[0]
    blurred = np.stack([cv2.GaussianBlur(x[i], (3, 3), 0) for i in range(t)])
    return _blend(x, blurred, _enhance_factor(level))


def _enhance_factor(level):
    # timm "inc" semantics: factor in [0.1, 1.9] symmetric around 1
    f = (level / _MAX_LEVEL) * 0.9
    if np.random.uniform() > 0.5:
        f = -f
    return 1.0 + f


def _shear_x(x, level):
    import cv2
    s = (level / _MAX_LEVEL) * 0.3
    if np.random.uniform() > 0.5:
        s = -s
    t, h, w, c = x.shape
    m = np.float32([[1, s, 0], [0, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _shear_y(x, level):
    import cv2
    s = (level / _MAX_LEVEL) * 0.3
    if np.random.uniform() > 0.5:
        s = -s
    t, h, w, c = x.shape
    m = np.float32([[1, 0, 0], [s, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _translate_x(x, level):
    import cv2
    t_, h, w, c = x.shape
    px = (level / _MAX_LEVEL) * 0.45 * w
    if np.random.uniform() > 0.5:
        px = -px
    m = np.float32([[1, 0, px], [0, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t_)])


def _translate_y(x, level):
    import cv2
    t_, h, w, c = x.shape
    px = (level / _MAX_LEVEL) * 0.45 * h
    if np.random.uniform() > 0.5:
        px = -px
    m = np.float32([[1, 0, 0], [0, 1, px]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t_)])


_OPS = {
    "AutoContrast": _autocontrast,
    "Equalize": _equalize,
    "Invert": _invert,
    "Rotate": _rotate,
    "Posterize": _posterize,
    "Solarize": _solarize,
    "Color": _color,
    "Contrast": _contrast,
    "Brightness": _brightness,
    "Sharpness": _sharpness,
    "ShearX": _shear_x,
    "ShearY": _shear_y,
    "TranslateX": _translate_x,
    "TranslateY": _translate_y,
}


class RandAugment:
    """``rand-mN-nK-mstdS`` policy: K random ops at magnitude ~N(mag, std)."""

    def __init__(self, magnitude=9, num_ops=2, mag_std=0.5):
        self.magnitude = magnitude
        self.num_ops = num_ops
        self.mag_std = mag_std
        self.ops = list(_OPS)

    def __call__(self, frames, rng=None):
        rng = rng or np.random.default_rng()
        for _ in range(self.num_ops):
            name = self.ops[int(rng.integers(len(self.ops)))]
            mag = self.magnitude
            if self.mag_std > 0:
                mag = float(np.clip(rng.normal(mag, self.mag_std), 0, _MAX_LEVEL))
            frames = _OPS[name](frames, mag)
        return frames


def create_auto_augmentation(type_str, crop_size=224, mean=None):
    """Parse the reference's factory string (auto_augment.py:714):
    e.g. ``rand-m9-mstd0.5-inc1`` or ``rand-m7-n4-mstd0.5-inc1``."""
    parts = type_str.split("-")
    assert parts[0] == "rand", f"unsupported auto-augment type {type_str}"
    magnitude, num_ops, mag_std = 9, 2, 0.5
    for p in parts[1:]:
        if p.startswith("mstd"):
            mag_std = float(p[4:])
        elif p.startswith("m"):
            magnitude = int(p[1:])
        elif p.startswith("n"):
            num_ops = int(p[1:])
        elif p.startswith("inc"):
            pass  # increasing-severity variants share our op curves
    return RandAugment(magnitude, num_ops, mag_std)


class RandomErasing:
    """Random erasing on a clip (reference dataset/utils/random_erasing.py:
    14-100): const / rand / pixel fill modes, clip-consistent region."""

    def __init__(self, prob=0.25, mode="pixel", count=(1, 1),
                 area_range=(0.02, 0.33), min_aspect=0.3):
        self.prob = prob
        self.mode = mode
        self.count = count
        self.area_range = area_range
        self.min_aspect = min_aspect

    def __call__(self, frames, rng=None):
        rng = rng or np.random.default_rng()
        if rng.uniform() >= self.prob:
            return frames
        frames = frames.copy()
        t, h, w, c = frames.shape
        n = int(rng.integers(self.count[0], self.count[1] + 1))
        for _ in range(n):
            for _ in range(10):
                area = rng.uniform(*self.area_range) * h * w
                log_ratio = (np.log(self.min_aspect), np.log(1 / self.min_aspect))
                aspect = np.exp(rng.uniform(*log_ratio))
                eh = int(round(np.sqrt(area * aspect)))
                ew = int(round(np.sqrt(area / aspect)))
                if eh < h and ew < w:
                    y = int(rng.integers(0, h - eh))
                    x = int(rng.integers(0, w - ew))
                    if self.mode == "pixel":
                        fill = rng.integers(0, 256, (t, eh, ew, c), dtype=np.uint8)
                    elif self.mode == "rand":
                        fill = np.full((t, eh, ew, c),
                                       int(rng.integers(0, 256)), np.uint8)
                    else:
                        fill = np.zeros((t, eh, ew, c), np.uint8)
                    frames[:, y:y + eh, x:x + ew] = fill
                    break
        return frames
