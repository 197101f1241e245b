"""Temporal sampling math vs hand-computed values
(reference base_dataset.py:513-576 semantics)."""

import numpy as np

from dist_tpu.data.sampling import (
    interval_based_sampling,
    segment_based_sampling,
)


def test_interval_deterministic_center():
    # vid 100 frames @30fps, 4 frames, interval 8, single clip -> centered
    idx = interval_based_sampling(100, 30, clip_idx=0, num_clips=1,
                                  num_frames=4, interval=8, target_fps=30)
    clip_len = 4 * 8  # 32
    start = (100 - clip_len) / 2  # 34
    # truncation, matching torch .long() (base_dataset.py:547)
    expect = np.linspace(start, start + clip_len - 1, 4).astype(int)
    np.testing.assert_array_equal(idx, np.clip(expect, 0, 99))


def test_interval_fps_normalization():
    # 60fps source: window doubles in frames
    idx30 = interval_based_sampling(1000, 30, 0, 1, 4, 8, target_fps=30)
    idx60 = interval_based_sampling(1000, 60, 0, 1, 4, 8, target_fps=30)
    span30 = idx30[-1] - idx30[0]
    span60 = idx60[-1] - idx60[0]
    assert abs(span60 - 2 * span30) <= 2


def test_interval_multiclip_positions():
    # clip k of n starts at max_idx * k / n
    i0 = interval_based_sampling(100, 30, 0, 4, 4, 4)
    i3 = interval_based_sampling(100, 30, 3, 4, 4, 4)
    assert i0[0] < i3[0]
    max_idx = 100 - 16
    assert abs(i3[0] - max_idx * 3 / 4) <= 1


def test_segment_deterministic_single_clip():
    # centers of 4 equal segments of [0, 80)
    idx = segment_based_sampling(80, 0, 1, 4, random_sample=False)
    np.testing.assert_array_equal(idx, [10, 30, 50, 70])


def test_segment_multiclip_shifts():
    a = segment_based_sampling(80, 0, 3, 4, random_sample=False)
    b = segment_based_sampling(80, 2, 3, 4, random_sample=False)
    assert (b >= a).all() and (b > a).any()


def test_segment_random_within_segments():
    rng = np.random.default_rng(0)
    idx = segment_based_sampling(80, -1, 1, 4, random_sample=True, rng=rng)
    bounds = np.linspace(0, 80, 5)
    for i, v in enumerate(idx):
        assert bounds[i] <= v <= bounds[i + 1]
    # monotone non-decreasing
    assert (np.diff(idx) >= 0).all()
