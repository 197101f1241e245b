"""Spatial transforms: controlled crops, resize, flips."""

import numpy as np

from dist_tpu.data.transforms import (
    auto_resized_crop,
    horizontal_flip,
    kinetics_resized_crop_controlled,
    kinetics_resized_crop_random,
    resize_short_side,
)


def _frames(h=60, w=80):
    return np.arange(2 * h * w * 3, dtype=np.uint8).reshape(2, h, w, 3)


def test_resize_short_side():
    out = resize_short_side(_frames(), 30)
    assert out.shape == (2, 30, 40, 3)
    out = resize_short_side(_frames(40, 30), 60)
    assert out.shape == (2, 80, 60, 3)


def test_controlled_crop_positions_differ():
    f = _frames(60, 100)
    crops = [kinetics_resized_crop_controlled(f, 56, 56, 3, i)
             for i in range(3)]
    assert all(c.shape == (2, 56, 56, 3) for c in crops)
    assert not np.array_equal(crops[0], crops[2])
    # center crop with 1 view
    c = kinetics_resized_crop_controlled(f, 56, 56, 1, 0)
    assert c.shape == (2, 56, 56, 3)


def test_random_crop_in_range():
    rng = np.random.default_rng(0)
    out = kinetics_resized_crop_random(_frames(), (40, 50), 32, rng)
    assert out.shape == (2, 32, 32, 3)


def test_auto_resized_crop_positions():
    f = _frames(80, 80)
    # scale 0.5 -> resize short side to 80, leaving room for the positions
    outs = {m: auto_resized_crop(f, (0.5, 0.5), 40, m)
            for m in ("cc", "ll", "rr", "tl", "tr", "bl", "br")}
    assert all(o.shape == (2, 40, 40, 3) for o in outs.values())
    assert not np.array_equal(outs["tl"], outs["br"])
    rng = np.random.default_rng(0)
    out = auto_resized_crop(f, (0.8, 1.0), 40, "rand", rng)
    assert out.shape == (2, 40, 40, 3)


def test_hflip():
    f = _frames()
    np.testing.assert_array_equal(horizontal_flip(f), f[:, :, ::-1])
