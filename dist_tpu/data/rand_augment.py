"""RandAugment / AutoAugment / AugMix for video clips (reference
dataset/utils/auto_augment.py — the timm port; factory
``creat_auto_augmentation``, auto_augment.py:714).

Fresh numpy/cv2 implementation over uint8 (T, H, W, C) clips with
clip-consistent magnitudes (every frame of a clip gets the same ops —
matching the reference's per-clip PIL loop with shared params).

Three augmentation families behind one factory string
(:func:`create_auto_augmentation`):

- ``rand-mN-nK-mstdS[-incZ]`` — RandAugment (auto_augment.py:530-741),
- ``v0 | v0r | original | originalr`` (with optional ``-mstdS``) —
  AutoAugment sub-policy tables (auto_augment.py:358-525),
- ``augmix-mN-wW-dD[-aA]`` — AugMix chains (auto_augment.py:744-867).
"""

import numpy as np

_MAX_LEVEL = 10.0


# --------------------------------------------------------------------------
# primitive image ops on uint8 clips (T, H, W, C)


def _blend(a, b, alpha):
    return np.clip(a.astype(np.float32) * alpha
                   + b.astype(np.float32) * (1 - alpha), 0, 255).astype(np.uint8)


def _autocontrast(x, _arg):
    lo = x.min(axis=(0, 1, 2), keepdims=True).astype(np.float32)
    hi = x.max(axis=(0, 1, 2), keepdims=True).astype(np.float32)
    scale = 255.0 / np.maximum(hi - lo, 1)
    return np.clip((x - lo) * scale, 0, 255).astype(np.uint8)


def _equalize(x, _arg):
    import cv2
    out = np.empty_like(x)
    for t in range(x.shape[0]):
        for c in range(x.shape[-1]):
            out[t, :, :, c] = cv2.equalizeHist(x[t, :, :, c])
    return out


def _invert(x, _arg):
    return 255 - x


def _rotate(x, deg):
    import cv2
    t, h, w, c = x.shape
    m = cv2.getRotationMatrix2D((w / 2, h / 2), deg, 1.0)
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _posterize(x, bits):
    bits = int(np.clip(bits, 1, 8))  # 0 bits would be a black image
    mask = 256 - (1 << (8 - bits))
    return (x & mask).astype(np.uint8)


def _solarize(x, thr):
    return np.where(x >= thr, 255 - x, x).astype(np.uint8)


def _solarize_add(x, add, thr=128):
    lut = np.arange(256, dtype=np.int32)
    lut = np.where(lut < thr, np.clip(lut + int(add), 0, 255), lut)
    return lut.astype(np.uint8)[x]


def _color(x, factor):
    gray = (x @ np.asarray([0.299, 0.587, 0.114], np.float32))[..., None]
    return _blend(x, np.repeat(gray, 3, axis=-1), factor)


def _contrast(x, factor):
    mean = float(x.astype(np.float32).mean())
    return _blend(x, np.full_like(x, int(mean)), factor)


def _brightness(x, factor):
    return _blend(x, np.zeros_like(x), factor)


def _sharpness(x, factor):
    import cv2
    t = x.shape[0]
    blurred = np.stack([cv2.GaussianBlur(x[i], (3, 3), 0) for i in range(t)])
    return _blend(x, blurred, factor)


def _shear_x(x, s):
    import cv2
    t, h, w, c = x.shape
    m = np.float32([[1, s, 0], [0, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _shear_y(x, s):
    import cv2
    t, h, w, c = x.shape
    m = np.float32([[1, 0, 0], [s, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t)])


def _translate_x(x, px):
    import cv2
    t_, h, w, c = x.shape
    m = np.float32([[1, 0, px], [0, 1, 0]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t_)])


def _translate_y(x, px):
    import cv2
    t_, h, w, c = x.shape
    m = np.float32([[1, 0, 0], [0, 1, px]])
    return np.stack([cv2.warpAffine(x[i], m, (w, h)) for i in range(t_)])


def _translate_x_rel(x, frac):
    return _translate_x(x, frac * x.shape[2])


def _translate_y_rel(x, frac):
    return _translate_y(x, frac * x.shape[1])


# --------------------------------------------------------------------------
# level -> op-argument mappers (auto_augment.py:173-251). ``rng`` draws the
# random sign for symmetric ops.


def _signed(v, rng):
    return -v if rng.uniform() > 0.5 else v


def _rotate_level(level, rng):
    return _signed((level / _MAX_LEVEL) * 30.0, rng)


def _shear_level(level, rng):
    return _signed((level / _MAX_LEVEL) * 0.3, rng)


def _translate_rel_level(level, rng):
    return _signed((level / _MAX_LEVEL) * 0.45, rng)


def _enhance_level(level, rng):
    # timm non-increasing: factor in [0.1, 1.9] directly from the level
    return (level / _MAX_LEVEL) * 1.8 + 0.1


def _enhance_increasing_level(level, rng):
    # "inc" semantics: severity grows with level, random direction
    return 1.0 + _signed((level / _MAX_LEVEL) * 0.9, rng)


def _posterize_level(level, rng):
    return int((level / _MAX_LEVEL) * 4)


def _posterize_increasing_level(level, rng):
    return 4 - int((level / _MAX_LEVEL) * 4)


def _posterize_original_level(level, rng):
    return int((level / _MAX_LEVEL) * 4) + 4


def _solarize_level(level, rng):
    return min(256, int((level / _MAX_LEVEL) * 256))


def _solarize_increasing_level(level, rng):
    return 256 - _solarize_level(level, rng)


def _solarize_add_level(level, rng):
    return min(128, int((level / _MAX_LEVEL) * 110))


_OPS = {
    # name: (op_fn, level_fn or None)
    "AutoContrast": (_autocontrast, None),
    "Equalize": (_equalize, None),
    "Invert": (_invert, None),
    "Rotate": (_rotate, _rotate_level),
    "Posterize": (_posterize, _posterize_level),
    "PosterizeIncreasing": (_posterize, _posterize_increasing_level),
    "PosterizeOriginal": (_posterize, _posterize_original_level),
    "Solarize": (_solarize, _solarize_level),
    "SolarizeIncreasing": (_solarize, _solarize_increasing_level),
    "SolarizeAdd": (_solarize_add, _solarize_add_level),
    "Color": (_color, _enhance_level),
    "ColorIncreasing": (_color, _enhance_increasing_level),
    "Contrast": (_contrast, _enhance_level),
    "ContrastIncreasing": (_contrast, _enhance_increasing_level),
    "Brightness": (_brightness, _enhance_level),
    "BrightnessIncreasing": (_brightness, _enhance_increasing_level),
    "Sharpness": (_sharpness, _enhance_level),
    "SharpnessIncreasing": (_sharpness, _enhance_increasing_level),
    "ShearX": (_shear_x, _shear_level),
    "ShearY": (_shear_y, _shear_level),
    "TranslateX": (_translate_x_rel, _translate_rel_level),
    "TranslateY": (_translate_y_rel, _translate_rel_level),
    "TranslateXRel": (_translate_x_rel, _translate_rel_level),
    "TranslateYRel": (_translate_y_rel, _translate_rel_level),
}


def apply_op(name, frames, level, rng):
    fn, level_fn = _OPS[name]
    arg = level_fn(level, rng) if level_fn is not None else None
    return fn(frames, arg)


# RandAugment op pool: the "inc" (increasing-severity) transform set the
# DiST/TAda recipes use (auto_augment.py:553-588, _RAND_INCREASING_TRANSFORMS)
_RAND_INCREASING = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "PosterizeIncreasing",
    "SolarizeIncreasing", "SolarizeAdd", "ColorIncreasing",
    "ContrastIncreasing", "BrightnessIncreasing", "SharpnessIncreasing",
    "ShearX", "ShearY", "TranslateXRel", "TranslateYRel",
]
_RAND_DEFAULT = [
    "AutoContrast", "Equalize", "Invert", "Rotate", "Posterize", "Solarize",
    "SolarizeAdd", "Color", "Contrast", "Brightness", "Sharpness", "ShearX",
    "ShearY", "TranslateXRel", "TranslateYRel",
]

_AUGMIX_TRANSFORMS = [
    "AutoContrast", "ColorIncreasing", "ContrastIncreasing",
    "BrightnessIncreasing", "SharpnessIncreasing", "Equalize", "Rotate",
    "PosterizeIncreasing", "SolarizeIncreasing", "ShearX", "ShearY",
    "TranslateXRel", "TranslateYRel",
]


def _jitter(magnitude, mag_std, rng):
    if mag_std == float("inf"):
        return float(rng.uniform(0, magnitude))
    if mag_std > 0:
        return float(np.clip(rng.normal(magnitude, mag_std), 0, _MAX_LEVEL))
    return float(magnitude)


class RandAugment:
    """``rand-mN-nK-mstdS`` policy: K random ops at magnitude ~N(mag, std)."""

    def __init__(self, magnitude=9, num_ops=2, mag_std=0.5, increasing=True):
        self.magnitude = magnitude
        self.num_ops = num_ops
        self.mag_std = mag_std
        self.ops = list(_RAND_INCREASING if increasing else _RAND_DEFAULT)

    def __call__(self, frames, rng=None):
        rng = rng or np.random.default_rng()
        for _ in range(self.num_ops):
            # each chosen op fires with prob 0.5 (reference AugmentOp
            # prob=0.5 in rand_augment_transform, auto_augment.py:630,334)
            if rng.uniform() > 0.5:
                continue
            name = self.ops[int(rng.integers(len(self.ops)))]
            frames = apply_op(name, frames,
                              _jitter(self.magnitude, self.mag_std, rng), rng)
        return frames


# AutoAugment sub-policy tables (auto_augment.py:358-492); entries are
# (op name, probability, magnitude)
_POLICY_V0 = [
    [("Equalize", 0.8, 1), ("ShearY", 0.8, 4)],
    [("Color", 0.4, 9), ("Equalize", 0.6, 3)],
    [("Color", 0.4, 1), ("Rotate", 0.6, 8)],
    [("Solarize", 0.8, 3), ("Equalize", 0.4, 7)],
    [("Solarize", 0.4, 2), ("Solarize", 0.6, 2)],
    [("Color", 0.2, 0), ("Equalize", 0.8, 8)],
    [("Equalize", 0.4, 8), ("SolarizeAdd", 0.8, 3)],
    [("ShearX", 0.2, 9), ("Rotate", 0.6, 8)],
    [("Color", 0.6, 1), ("Equalize", 1.0, 2)],
    [("Invert", 0.4, 9), ("Rotate", 0.6, 0)],
    [("Equalize", 1.0, 9), ("ShearY", 0.6, 3)],
    [("Color", 0.4, 7), ("Equalize", 0.6, 0)],
    [("Posterize", 0.4, 6), ("AutoContrast", 0.4, 7)],
    [("Solarize", 0.6, 8), ("Color", 0.6, 9)],
    [("Solarize", 0.2, 4), ("Rotate", 0.8, 9)],
    [("Rotate", 1.0, 7), ("TranslateYRel", 0.8, 9)],
    [("ShearX", 0.0, 0), ("Solarize", 0.8, 4)],
    [("ShearY", 0.8, 0), ("Color", 0.6, 4)],
    [("Color", 1.0, 0), ("Rotate", 0.6, 2)],
    [("Equalize", 0.8, 4), ("Equalize", 0.0, 8)],
    [("Equalize", 1.0, 4), ("AutoContrast", 0.6, 2)],
    [("ShearY", 0.4, 7), ("SolarizeAdd", 0.6, 7)],
    [("Posterize", 0.8, 2), ("Solarize", 0.6, 10)],
    [("Solarize", 0.6, 8), ("Equalize", 0.6, 1)],
    [("Color", 0.8, 6), ("Rotate", 0.4, 5)],
]

_POLICY_ORIGINAL = [
    [("PosterizeOriginal", 0.4, 8), ("Rotate", 0.6, 9)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
    [("PosterizeOriginal", 0.6, 7), ("PosterizeOriginal", 0.6, 6)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Equalize", 0.4, 4), ("Rotate", 0.8, 8)],
    [("Solarize", 0.6, 3), ("Equalize", 0.6, 7)],
    [("PosterizeOriginal", 0.8, 5), ("Equalize", 1.0, 2)],
    [("Rotate", 0.2, 3), ("Solarize", 0.6, 8)],
    [("Equalize", 0.6, 8), ("PosterizeOriginal", 0.4, 6)],
    [("Rotate", 0.8, 8), ("Color", 0.4, 0)],
    [("Rotate", 0.4, 9), ("Equalize", 0.6, 2)],
    [("Equalize", 0.0, 7), ("Equalize", 0.8, 8)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Rotate", 0.8, 8), ("Color", 1.0, 2)],
    [("Color", 0.8, 8), ("Solarize", 0.8, 7)],
    [("Sharpness", 0.4, 7), ("Invert", 0.6, 8)],
    [("ShearX", 0.6, 5), ("Equalize", 1.0, 9)],
    [("Color", 0.4, 0), ("Equalize", 0.6, 3)],
    [("Equalize", 0.4, 7), ("Solarize", 0.2, 4)],
    [("Solarize", 0.6, 5), ("AutoContrast", 0.6, 5)],
    [("Invert", 0.6, 4), ("Equalize", 1.0, 8)],
    [("Color", 0.6, 4), ("Contrast", 1.0, 8)],
    [("Equalize", 0.8, 8), ("Equalize", 0.6, 3)],
]


def _replace_op(policy, old, new):
    return [[(new if n == old else n, p, m) for (n, p, m) in sp]
            for sp in policy]


_POLICIES = {
    "v0": _POLICY_V0,
    "v0r": _replace_op(_POLICY_V0, "Posterize", "PosterizeIncreasing"),
    "original": _POLICY_ORIGINAL,
    "originalr": _replace_op(_POLICY_ORIGINAL, "PosterizeOriginal",
                             "PosterizeIncreasing"),
}


class AutoAugment:
    """One random sub-policy per clip; each op fires with its probability at
    its fixed magnitude (auto_augment.py:508-525)."""

    def __init__(self, policy_name="v0", mag_std=0.0):
        assert policy_name in _POLICIES, f"Unknown AA policy ({policy_name})"
        self.policy_name = policy_name
        self.policy = _POLICIES[policy_name]
        self.mag_std = mag_std

    def __call__(self, frames, rng=None):
        rng = rng or np.random.default_rng()
        sub = self.policy[int(rng.integers(len(self.policy)))]
        for name, prob, mag in sub:
            if rng.uniform() <= prob:
                frames = apply_op(name, frames,
                                  _jitter(mag, self.mag_std, rng), rng)
        return frames


class AugMixAugment:
    """AugMix (auto_augment.py:751-820, _apply_basic): ``width`` parallel op
    chains of random depth, Dirichlet-mixed, then beta-blended with the
    original clip."""

    def __init__(self, magnitude=3, width=3, depth=-1, alpha=1.0,
                 mag_std=float("inf")):
        self.magnitude = magnitude
        self.width = width
        self.depth = depth
        self.alpha = alpha
        self.mag_std = mag_std
        self.ops = list(_AUGMIX_TRANSFORMS)

    def __call__(self, frames, rng=None):
        rng = rng or np.random.default_rng()
        ws = rng.dirichlet([self.alpha] * self.width).astype(np.float32)
        m = float(rng.beta(self.alpha, self.alpha))
        mixed = np.zeros(frames.shape, np.float32)
        for w in ws:
            depth = self.depth if self.depth > 0 else int(rng.integers(1, 4))
            aug = frames
            for _ in range(depth):
                name = self.ops[int(rng.integers(len(self.ops)))]
                aug = apply_op(name, aug,
                               _jitter(self.magnitude, self.mag_std, rng), rng)
            mixed += w * aug.astype(np.float32)
        out = (1 - m) * frames.astype(np.float32) + m * np.clip(mixed, 0, 255)
        return np.clip(out, 0, 255).astype(np.uint8)


def create_auto_augmentation(type_str, crop_size=224, mean=None):
    """Factory covering all three families (reference ``rand_augment_transform``
    auto_augment.py:714, ``auto_augment_transform`` :528, and
    ``augment_and_mix_transform`` :826):

    - ``rand-m9-mstd0.5-inc1``, ``rand-m7-n4-mstd0.5``
    - ``v0`` / ``v0r`` / ``original`` / ``originalr`` (+ ``-mstd0.5``)
    - ``augmix-m5-w4-d2`` (+ ``-aA`` alpha)
    """
    parts = type_str.split("-")
    kind = parts[0]
    if kind == "rand":
        magnitude, num_ops, mag_std, increasing = 9, 2, 0.5, False
        for p in parts[1:]:
            if p.startswith("mstd"):
                mag_std = float(p[4:])
            elif p.startswith("mmax"):
                pass
            elif p.startswith("m"):
                magnitude = int(p[1:])
            elif p.startswith("n"):
                num_ops = int(p[1:])
            elif p.startswith("inc"):
                increasing = bool(int(p[3:]))
            elif p.startswith("w"):
                pass  # weighted op choice: not used by any shipped recipe
        return RandAugment(magnitude, num_ops, mag_std, increasing)
    if kind == "augmix":
        magnitude, width, depth, alpha, mag_std = 3, 3, -1, 1.0, float("inf")
        for p in parts[1:]:
            if p.startswith("mstd"):
                mag_std = float(p[4:])
            elif p.startswith("m"):
                magnitude = int(p[1:])
            elif p.startswith("w"):
                width = int(p[1:])
            elif p.startswith("d"):
                depth = int(p[1:])
            elif p.startswith("a"):
                alpha = float(p[1:])
        return AugMixAugment(magnitude, width, depth, alpha, mag_std)
    # AutoAugment policy name, e.g. "v0" or "original-mstd0.5"
    mag_std = 0.0
    for p in parts[1:]:
        if p.startswith("mstd"):
            mag_std = float(p[4:])
    return AutoAugment(kind, mag_std)


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
