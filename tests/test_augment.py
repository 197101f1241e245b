"""RandAugment / RandomErasing / mixup behavior tests."""

import numpy as np

import jax
import jax.numpy as jnp

from dist_tpu.data.rand_augment import (
    RandAugment,
    RandomErasing,
    create_auto_augmentation,
)
from dist_tpu.data.mixup import MixupConfig, mixup_batch


def test_randaugment_factory_parse():
    ra = create_auto_augmentation("rand-m7-n4-mstd0.5-inc1")
    assert ra.magnitude == 7 and ra.num_ops == 4 and ra.mag_std == 0.5
    ra = create_auto_augmentation("rand-m9-mstd0.5-inc1")
    assert ra.magnitude == 9 and ra.num_ops == 2


def test_randaugment_applies():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    out = None
    for _ in range(8):  # each op fires with prob 0.5; 8 tries can't all no-op
        out = RandAugment(magnitude=9, num_ops=2)(frames, rng)
        if not np.array_equal(out, frames):
            break
    assert out.shape == frames.shape and out.dtype == np.uint8
    assert not np.array_equal(out, frames)


def test_random_erasing_erases():
    rng = np.random.default_rng(0)
    frames = np.full((2, 32, 32, 3), 128, np.uint8)
    out = RandomErasing(prob=1.0, mode="const")(frames, rng)
    assert (out == 0).any()
    # prob=0 leaves input untouched
    out2 = RandomErasing(prob=0.0)(frames, rng)
    np.testing.assert_array_equal(out2, frames)


def test_mixup_batch_targets_sum_to_one():
    mc = MixupConfig(mixup_alpha=0.8, cutmix_alpha=1.0, num_classes=10,
                     smoothing=0.1)
    video = jnp.ones((4, 2, 8, 8, 3))
    labels = jnp.arange(4)
    mixed, target = mixup_batch(jax.random.PRNGKey(0), video, labels, mc)
    assert mixed.shape == video.shape
    np.testing.assert_allclose(np.asarray(target.sum(-1)), 1.0, atol=1e-5)


def test_mixup_lam_correction_bounds():
    mc = MixupConfig(mixup_alpha=0.0, cutmix_alpha=1.0, num_classes=5,
                     smoothing=0.0, switch_prob=1.0)
    video = jnp.stack([jnp.zeros((2, 16, 16, 3)), jnp.ones((2, 16, 16, 3))])
    labels = jnp.asarray([0, 1])
    mixed, target = mixup_batch(jax.random.PRNGKey(3), video, labels, mc)
    # cutmix replaced a box of item0 with item1's pixels: fraction of ones
    # in mixed[0] equals 1 - lam = target weight on label 1
    frac = float(np.asarray(mixed[0]).mean())
    np.testing.assert_allclose(float(target[0, 1]), frac, atol=1e-5)


def test_autoaugment_policies_and_augmix():
    """Policy-table AutoAugment + AugMix through the factory
    (reference auto_augment.py:358-525, 744-867)."""
    from dist_tpu.data.rand_augment import (
        AugMixAugment, AutoAugment, apply_op)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)

    for name in ("v0", "v0r", "original", "originalr"):
        aa = create_auto_augmentation(name)
        assert isinstance(aa, AutoAugment) and aa.policy_name == name
        out = aa(frames, np.random.default_rng(1))
        assert out.shape == frames.shape and out.dtype == np.uint8

    aa = create_auto_augmentation("original-mstd0.5")
    assert aa.mag_std == 0.5

    am = create_auto_augmentation("augmix-m5-w4-d2")
    assert isinstance(am, AugMixAugment)
    assert am.magnitude == 5 and am.width == 4 and am.depth == 2
    out = am(frames, np.random.default_rng(2))
    assert out.shape == frames.shape and out.dtype == np.uint8
    assert not np.array_equal(out, frames)

    # every op in every policy/pool is executable at its table magnitude
    from dist_tpu.data.rand_augment import (_AUGMIX_TRANSFORMS, _POLICIES,
                                            _RAND_INCREASING)
    names = set(_RAND_INCREASING) | set(_AUGMIX_TRANSFORMS)
    for pol in _POLICIES.values():
        for sub in pol:
            names |= {n for n, _, _ in sub}
    for n in sorted(names):
        out = apply_op(n, frames, 7.0, np.random.default_rng(3))
        assert out.shape == frames.shape, n


def test_solarize_add_and_posterize_levels():
    from dist_tpu.data.rand_augment import apply_op

    frames = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    rng = np.random.default_rng(0)
    out = apply_op("SolarizeAdd", frames, 10.0, rng)  # add=110 below 128
    assert out[0, 0, 0, 0] == 110 and out[0, 15, 15, 0] == 255
    # PosterizeOriginal keeps >= 4 bits even at level 0
    out = apply_op("PosterizeOriginal", frames, 0.0, rng)
    assert len(np.unique(out)) >= 16


def test_cutmix_minmax_box_and_lam():
    """AUGMENTATION.CUTMIX.MINMAX: each box side drawn in [min,max) of the
    image dimension; lambda = 1 - box_area/image_area (reference
    rand_bbox_minmax + cutmix_bbox_and_lam, mixup.py:68-104)."""
    mc = MixupConfig(mixup_alpha=0.0, cutmix_alpha=0.5, num_classes=5,
                     smoothing=0.0, cutmix_minmax=(0.25, 0.75))
    h = w = 32
    video = jnp.stack([jnp.zeros((2, h, w, 3)), jnp.ones((2, h, w, 3))])
    labels = jnp.asarray([0, 1])
    for seed in range(5):
        mixed, target = mixup_batch(jax.random.PRNGKey(seed), video, labels, mc)
        frac = float(np.asarray(mixed[0]).mean())  # 1 - lam
        np.testing.assert_allclose(float(target[0, 1]), frac, atol=1e-5)
        # box sides within the minmax range
        cols = np.asarray(mixed[0, 0, :, :, 0]).max(axis=0).sum()
        rows = np.asarray(mixed[0, 0, :, :, 0]).max(axis=1).sum()
        assert h * 0.25 <= rows < h * 0.75
        assert w * 0.25 <= cols < w * 0.75


def test_cutmix_minmax_from_cfg_forces_cutmix():
    import os
    from dist_tpu.config import load_config
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs/projects/dist/ssv2/vit-b16-8+16f.yaml"),
        make_output_dir=False)
    cfg.AUGMENTATION.CUTMIX.ENABLE = True
    cfg.AUGMENTATION.CUTMIX.ALPHA = 0.0
    cfg.AUGMENTATION.CUTMIX.MINMAX = [0.2, 0.8]
    mc = MixupConfig.from_cfg(cfg)
    assert mc.cutmix_minmax == (0.2, 0.8)
    assert mc.cutmix_alpha == 0.5 and mc.enabled
