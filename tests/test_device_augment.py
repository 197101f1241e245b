"""On-device augmentation: shape/range invariants + determinism."""

import numpy as np

import jax
import jax.numpy as jnp

from dist_tpu.ops.augment_device import (
    DeviceAugConfig,
    color_jitter,
    device_augment,
    gaussian_blur,
    random_hflip,
)


def test_color_jitter_range_and_determinism():
    c = DeviceAugConfig(brightness=0.4, contrast=0.4, saturation=0.2,
                        hue=0.1, grayscale=0.2, color_p=1.0)
    v = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 8, 3))
    o1 = color_jitter(jax.random.PRNGKey(1), v, c)
    o2 = color_jitter(jax.random.PRNGKey(1), v, c)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(o1.min()) >= 0.0 and float(o1.max()) <= 1.0
    assert not np.allclose(np.asarray(o1), np.asarray(v))


def test_hflip_flips_some():
    v = jnp.arange(2 * 1 * 2 * 4 * 1, dtype=jnp.float32).reshape(2, 1, 2, 4, 1)
    o = random_hflip(jax.random.PRNGKey(0), v, p=1.0)
    np.testing.assert_array_equal(np.asarray(o), np.asarray(v[:, :, :, ::-1]))


def test_gaussian_blur_smooths():
    c = DeviceAugConfig(blur_p=1.0, blur_sigma=1.0)
    v = jnp.zeros((1, 1, 9, 9, 1)).at[0, 0, 4, 4, 0].set(1.0)
    o = gaussian_blur(jax.random.PRNGKey(0), v, c)
    assert float(o[0, 0, 4, 4, 0]) < 1.0
    assert float(o.sum()) > 0.5  # mass preserved (edge-padded)


def test_device_augment_jits():
    c = DeviceAugConfig(brightness=0.4, color_p=1.0, blur_p=0.5)
    v = jax.random.uniform(jax.random.PRNGKey(0), (2, 2, 8, 8, 3))
    out = jax.jit(lambda k, x: device_augment(k, x, c))(jax.random.PRNGKey(1), v)
    assert out.shape == v.shape


def test_ssl_six_dim_batch_flips_width_not_height():
    """USE_GPU + SSL multi-view batches: the train step must flatten the
    view axis BEFORE device augmentation so hflip reverses W, not H
    (round-2 review finding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dist_tpu.ops.augment_device import random_hflip

    # the step flattens (B, n, T, H, W, C) -> (B*n, T, H, W, C); on the
    # flattened tensor random_hflip's axis -2 slice is W
    video = jnp.zeros((2, 2, 2, 4, 6, 3), jnp.float32)
    video = video.at[..., :, :3, :].set(1.0)  # left half-width ones
    flat = video.reshape((-1,) + video.shape[2:])
    out = random_hflip(jax.random.PRNGKey(3), flat, p=1.0)
    out = np.asarray(out)
    # width reversed: ones moved to the right half; height untouched
    assert (out[..., :, 3:, :] == 1.0).all()
    assert (out[..., :, :3, :] == 0.0).all()


def test_device_hue_matches_host_hsv():
    """In-jit HSV hue shift equals the host-side (reference-math) version."""
    import numpy as np
    import jax.numpy as jnp
    from dist_tpu.data import transforms as host_t
    from dist_tpu.ops import augment_device as dev

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, size=(2, 8, 8, 3)).astype(np.float32)
    shift = 0.23
    hh, ss, vv = host_t._rgb2hsv(x)
    host = host_t._hsv2rgb(np.mod(hh + shift, 1.0), ss, vv)
    dh, ds_, dv = dev._rgb2hsv(jnp.asarray(x))
    device = np.asarray(dev._hsv2rgb(jnp.mod(dh + shift, 1.0), ds_, dv))
    np.testing.assert_allclose(device, host, atol=2e-6)


def test_from_cfg_mirrors_host_gates(tmp_path):
    """USE_GPU must move the SAME augmentations on-device, never add new
    ones: color jitter only when COLOR_AUG (or the SSL COLOR gate) is on
    and AutoAugment is not taking its place (base_dataset._transform)."""
    import os

    from dist_tpu.config import load_config

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg_path = os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml")

    def cfg_with(*opts):
        return load_config(cfg_path, opts=["OUTPUT_DIR", str(tmp_path),
                                           "AUGMENTATION.BRIGHTNESS", "0.4",
                                           "AUGMENTATION.GRAYSCALE", "0.2",
                                           *opts], make_output_dir=False)

    # COLOR_AUG off: strengths present in cfg but the host path would not
    # jitter -> neither may the device path
    c = DeviceAugConfig.from_cfg(cfg_with("AUGMENTATION.COLOR_AUG", "false"))
    assert c.color_p == 0.0 and c.brightness == 0.0 and c.grayscale == 0.0

    # (the dist configs set COLOR_JITTER_P explicitly; it carries through)
    c = DeviceAugConfig.from_cfg(cfg_with("AUGMENTATION.COLOR_AUG", "true",
                                          "AUGMENTATION.COLOR_JITTER_P",
                                          "0.8"))
    assert c.brightness == 0.4 and c.grayscale == 0.2 and c.color_p == 0.8

    # AutoAugment replaces color jitter on the host path
    c = DeviceAugConfig.from_cfg(cfg_with(
        "AUGMENTATION.COLOR_AUG", "true",
        "AUGMENTATION.AUTOAUGMENT.ENABLE", "true"))
    assert c.color_p == 0.0 and c.brightness == 0.0

    # SSL gate: AUGMENTATION.COLOR sets the jitter probability directly
    # (the key only exists in the SSL recipe tree — set it post-load, the
    # CLI validator rejects keys absent from the schema)
    ssl_cfg = cfg_with()
    ssl_cfg.AUGMENTATION.COLOR = 0.6
    c = DeviceAugConfig.from_cfg(ssl_cfg)
    assert c.color_p == 0.6 and c.brightness == 0.4
