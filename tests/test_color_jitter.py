"""ColorJitter parity: the host jitter ops vs the reference's torch math
(transformations.py:175-320 — _blend, rgb_to_grayscale, _rgb2hsv/_hsv2rgb,
adjust_{brightness,contrast,saturation,hue}) re-expressed in torch here."""

import numpy as np
import pytest
import torch

from dist_tpu.data import transforms as T


def _clip(t=3, h=16, w=20, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(t, h, w, 3)).astype(np.uint8)


# ---- torch reference ops (on float (C,T,H,W) in [0,1]) ----

def _torch_gray(img):
    conv = torch.tensor([0.299, 0.587, 0.114])
    g = img.float().permute(1, 2, 3, 0).matmul(conv)
    return torch.stack([g, g, g], 0)


def _torch_blend(a, b, ratio):
    return (ratio * a + (1 - ratio) * b).clamp(0, 1)


def _torch_brightness(img, f):
    return _torch_blend(img, torch.zeros_like(img), f)


def _torch_contrast(img, f):
    mean = torch.mean(_torch_gray(img), dim=(-4, -2, -1), keepdim=True)
    return _torch_blend(img, mean, f)


def _torch_saturation(img, f):
    return _torch_blend(img, _torch_gray(img), f)


def _torch_hue(img, f):
    # reference adjust_hue via _rgb2hsv/_hsv2rgb (transformations.py:206-257)
    r, g, b = img.unbind(0)
    maxc, _ = torch.max(img, dim=0)
    minc, _ = torch.min(img, dim=0)
    eqc = maxc == minc
    cr = maxc - minc
    s = cr / torch.where(eqc, maxc.new_ones(()), maxc)
    crd = torch.where(eqc, maxc.new_ones(()), cr)
    rc, gc, bc = (maxc - r) / crd, (maxc - g) / crd, (maxc - b) / crd
    h = ((maxc == r) * (bc - gc)
         + ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
         + ((maxc != g) & (maxc != r)) * (4.0 + gc - rc))
    h = torch.fmod(h / 6.0 + 1.0, 1.0)
    h = (h + f) % 1.0
    i = torch.floor(h * 6.0)
    frac = h * 6.0 - i
    i = (i.to(torch.int32)) % 6
    p = torch.clamp(maxc * (1.0 - s), 0, 1)
    q = torch.clamp(maxc * (1.0 - s * frac), 0, 1)
    t_ = torch.clamp(maxc * (1.0 - s * (1.0 - frac)), 0, 1)
    mask = i == torch.arange(6)[:, None, None, None]
    a1 = torch.stack((maxc, q, p, p, t_, maxc))
    a2 = torch.stack((t_, maxc, maxc, q, p, p))
    a3 = torch.stack((p, p, t_, maxc, maxc, q))
    a4 = torch.stack((a1, a2, a3))
    return torch.einsum("itjk,xitjk->xtjk", mask.to(img.dtype), a4)


def _to_torch(frames_u8):
    # (T,H,W,C) uint8 -> (C,T,H,W) float in [0,1]
    return torch.from_numpy(
        frames_u8.astype(np.float32) / 255.0).permute(3, 0, 1, 2)


def _from_torch(img):
    x = img.permute(1, 2, 3, 0).numpy()
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


class _FixedRng:
    """Deterministic rng: uniform() returns queued scalars; array draws
    return fixed factors; shuffle is identity."""

    def __init__(self, uniforms, factor):
        self.uniforms = list(uniforms)
        self.factor = factor

    def uniform(self, lo=0.0, hi=1.0, size=None):
        if size is not None:
            return np.full(size, self.factor, np.float64)
        if self.uniforms:
            return self.uniforms.pop(0)
        # factor draws: map the fixed factor into [lo, hi] passthrough
        return self.factor

    def shuffle(self, x):
        pass


@pytest.mark.parametrize("op", ["brightness", "contrast", "saturation", "hue"])
def test_single_op_parity(op):
    frames = _clip()
    f = 1.3 if op != "hue" else 0.2
    # p-gate passes (uniform -> 0.0), grayscale gate fails (uniform -> 1.0)
    rng = _FixedRng(uniforms=[0.0], factor=f)
    kwargs = {op: 0.5 if op != "hue" else 0.25}
    # make the drawn factor land exactly on f: uniform(lo,hi) returns factor
    out = T.color_jitter_clip(frames, rng, shuffle=False, grayscale=0.0,
                              consistent=True, p=1.0, **kwargs)

    timg = _to_torch(frames)
    torch_op = {"brightness": _torch_brightness, "contrast": _torch_contrast,
                "saturation": _torch_saturation, "hue": _torch_hue}[op]
    expect = _from_torch(torch_op(timg, f))
    assert np.max(np.abs(out.astype(int) - expect.astype(int))) <= 1


def test_grayscale_first_and_last():
    frames = _clip()
    # grayscale gate passes; saturation factor 1.5
    rng1 = _FixedRng(uniforms=[0.0, 0.0], factor=1.5)
    out_first = T.color_jitter_clip(frames, rng1, saturation=0.5,
                                    grayscale=1.0, gray_first=True,
                                    shuffle=False, consistent=True)
    rng2 = _FixedRng(uniforms=[0.0, 0.0], factor=1.5)
    out_last = T.color_jitter_clip(frames, rng2, saturation=0.5,
                                   grayscale=1.0, gray_first=False,
                                   shuffle=False, consistent=True)
    # gray-first: saturation on a gray image is identity -> stays gray;
    # gray-last: output is gray either way, but paths differ via clamping
    g = out_first.astype(np.float32)
    assert np.allclose(g[..., 0], g[..., 1], atol=1) and np.allclose(
        g[..., 1], g[..., 2], atol=1)
    gl = out_last.astype(np.float32)
    assert np.allclose(gl[..., 0], gl[..., 1], atol=1)


def test_inconsistent_draws_per_frame_factors():
    frames = np.broadcast_to(_clip(t=1), (4, 16, 20, 3)).copy()

    class _PerFrameRng(_FixedRng):
        def uniform(self, lo=0.0, hi=1.0, size=None):
            if size is not None:
                # distinct factor per frame
                out = np.linspace(lo, hi, num=int(np.prod(size)))
                return out.reshape(size)
            return super().uniform(lo, hi)

    rng = _PerFrameRng(uniforms=[0.0], factor=1.0)
    out = T.color_jitter_clip(frames, rng, brightness=0.5, consistent=False,
                              shuffle=False, grayscale=0.0)
    # identical input frames + per-frame factors => frames now differ
    assert not np.array_equal(out[0], out[-1])


def test_p_gate_skips_jitter_but_not_grayscale():
    frames = _clip()
    # p-gate fails (first uniform 1.0 > p=0.5), grayscale gate passes (0.0)
    rng = _FixedRng(uniforms=[1.0, 0.0], factor=1.5)
    out = T.color_jitter_clip(frames, rng, brightness=0.5, grayscale=1.0,
                              p=0.5, shuffle=False, consistent=True)
    g = out.astype(np.float32)
    assert np.allclose(g[..., 0], g[..., 2], atol=1)
    expect = _from_torch(_torch_gray(_to_torch(frames)))
    assert np.max(np.abs(out.astype(int) - expect.astype(int))) <= 1
