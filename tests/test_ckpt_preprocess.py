import numpy as np

from dist_tpu.config import load_config
from dist_tpu.utils.ckpt_preprocess import inflate_2d_to_3d, preprocess_params

import os
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_inflate_2d_to_3d_preserves_response():
    """Inflated 3D conv on a temporally-constant input must equal the 2D
    conv response (the I3D property)."""
    k2 = np.random.default_rng(0).standard_normal((3, 3, 4, 8)).astype(np.float32)
    tpl = np.zeros((5, 3, 3, 4, 8), np.float32)
    out = inflate_2d_to_3d({"conv": {"kernel": k2}},
                           {"conv": {"kernel": tpl}})
    k3 = out["conv"]["kernel"]
    assert k3.shape == (5, 3, 3, 4, 8)
    np.testing.assert_allclose(k3.sum(axis=0), k2, atol=1e-6)


def _cfg(**pp):
    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.DATA.NUM_INPUT_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.VIDEO.BACKBONE.PATCH_SIZE = 16
    cfg.VIDEO.BACKBONE.TUBELET_SIZE = 2
    for k, v in pp.items():
        setattr(cfg.TRAIN.CHECKPOINT_PRE_PROCESS, k, v)
    return cfg


def test_pos_embed_repeat():
    cfg = _cfg(POS_EMBED="repeat")
    pe = np.arange(5 * 4, dtype=np.float32).reshape(1, 5, 4)  # cls + 4
    out = preprocess_params(cfg, {"pos_embd": pe})
    assert out["pos_embd"].shape == (1, 1 + 4 * 4, 4)  # f = 8/2 = 4
    np.testing.assert_allclose(out["pos_embd"][0, 0], pe[0, 0])
    np.testing.assert_allclose(out["pos_embd"][0, 1:5], pe[0, 1:])
    np.testing.assert_allclose(out["pos_embd"][0, 5:9], pe[0, 1:])


def test_pos_embed_super_resolution():
    cfg = _cfg(POS_EMBED="super-resolution")
    pe = np.random.default_rng(0).standard_normal((1, 1 + 9, 4)).astype(np.float32)
    out = preprocess_params(cfg, {"pos_embd": pe})
    # target side = 32/16 = 2 -> 4 patches
    assert out["pos_embd"].shape == (1, 5, 4)


def test_tubelet_central_frame():
    cfg = _cfg(PATCH_EMBED="central_frame")
    k = np.random.default_rng(0).standard_normal((1, 16, 16, 3, 8)).astype(np.float32)
    out = preprocess_params(cfg, {"stem": {"conv1": {"kernel": k}}})
    w = out["stem"]["conv1"]["kernel"]
    assert w.shape == (2, 16, 16, 3, 8)
    np.testing.assert_allclose(w[1], k[0])
    np.testing.assert_allclose(w[0], 0)
