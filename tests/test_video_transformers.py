"""Video transformer backbones: shapes + divided-attention correctness."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.models.base.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(yaml_name, extra=()):
    return load_config(
        os.path.join(REPO, "configs/pool/backbone", yaml_name),
        opts=["VIDEO.HEAD.NUM_CLASSES", "5",
              "DATA.NUM_INPUT_FRAMES", "4",
              "DATA.TRAIN_CROP_SIZE", "32",
              "VIDEO.BACKBONE.NUM_FEATURES", "64",
              "VIDEO.BACKBONE.NUM_HEADS", "2",
              "VIDEO.BACKBONE.DEPTH", "2",
              *extra],
        make_output_dir=False)


def test_timesformer_forward():
    cfg = _cfg("timesformer.yaml")
    model = build_model(cfg)
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, _ = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (2, 5)


def test_timesformer_eval_at_different_crop():
    """The hico++ ft_vit-s recipe trains at one crop and evals at another
    (TRAIN 112 / TEST 128); pos embed must bilinear-resize per frame and
    divided attention must group by the ACTUAL token count."""
    cfg = _cfg("timesformer.yaml")
    model = build_model(cfg)
    train_video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": train_video})
    eval_video = jnp.zeros((2, 4, 48, 48, 3), jnp.float32)
    preds, _ = model.apply(variables, {"video": eval_video}, train=False)
    assert preds.shape == (2, 5)
    assert bool(np.all(np.isfinite(np.asarray(preds))))


def test_vivit_forward_and_pos_embed_resize():
    cfg = _cfg("vivit_fac_enc.yaml", ["VIDEO.BACKBONE.DEPTH_TEMP", "1"])
    model = build_model(cfg)
    video = jnp.zeros((2, 4, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, _ = model.apply(variables, {"video": video}, train=False)
    assert preds.shape == (2, 5)
    # test-time spatial super-resolution (transformer.py:370-390)
    video_big = jnp.zeros((2, 4, 48, 48, 3), jnp.float32)
    preds_big, _ = model.apply(variables, {"video": video_big}, train=False)
    assert preds_big.shape == (2, 5)


def test_divided_attention_group_isolation():
    """In divided attention, a patch token's output must be invariant to
    patches OUTSIDE its group (other frames for spatial attention)."""
    from dist_tpu.models.backbones.video_transformer import _Attention

    rng = jax.random.PRNGKey(0)
    b, f, n, dim = 1, 2, 4, 16
    x = jax.random.normal(rng, (b, 1 + f * n, dim))
    attn = _Attention(dim, num_heads=2)
    variables = attn.init(rng, x, groups=f, group_size=n)
    out1 = attn.apply(variables, x, groups=f, group_size=n)

    # perturb frame 2's patches; frame 1 outputs must not move
    x2 = x.at[:, 1 + n:, :].add(1.0)
    out2 = attn.apply(variables, x2, groups=f, group_size=n)
    np.testing.assert_allclose(np.asarray(out1[:, 1:1 + n]),
                               np.asarray(out2[:, 1:1 + n]), atol=1e-5)
    # but the cls token (global) must move
    assert not np.allclose(np.asarray(out1[:, 0]), np.asarray(out2[:, 0]))
