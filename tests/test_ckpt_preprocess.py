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


def _train_state(variables):
    import jax.numpy as jnp
    from dist_tpu.tasks.state import TrainState
    return TrainState(step=jnp.zeros((), jnp.int32), variables=variables,
                      opt_state=(), ema_variables=None)


def _save_orbax(path, variables):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), {"epoch": np.asarray(1, np.int32),
                           "variables": variables})
    ckptr.wait_until_finished()


def test_load_train_checkpoint_inflates_2d(tmp_path):
    """Fine-tuning a 3D conv model from a 2D checkpoint inflates the conv
    kernels when TRAIN.CHECKPOINT_INFLATE is set (wired load path, not just
    the helper; reference utils/checkpoint.py:310-325)."""
    from dist_tpu.utils import checkpoint as cu

    k2 = np.random.default_rng(0).standard_normal((3, 3, 4, 8)).astype(np.float32)
    _save_orbax(tmp_path / "ck2d", {"params": {"conv": {"kernel": k2}}})

    cfg = _cfg()
    cfg.TRAIN.AUTO_RESUME = False
    cfg.TRAIN.CHECKPOINT_FILE_PATH = str(tmp_path / "ck2d")
    cfg.TRAIN.CHECKPOINT_INFLATE = True
    state = _train_state(
        {"params": {"conv": {"kernel": np.zeros((5, 3, 3, 4, 8), np.float32)}}})
    state, start_epoch, _ = cu.load_train_checkpoint(cfg, state)
    assert start_epoch == 0
    k3 = np.asarray(state.variables["params"]["conv"]["kernel"])
    assert k3.shape == (5, 3, 3, 4, 8)
    np.testing.assert_allclose(k3.sum(axis=0), k2, atol=1e-5)


def test_load_train_checkpoint_adapts_pos_embed_and_pops_head(tmp_path):
    """A ViT checkpoint at a different resolution loads through pos-embed
    super-resolution, and FINE_TUNE+POP_HEAD keeps the fresh head."""
    from dist_tpu.utils import checkpoint as cu

    rng = np.random.default_rng(0)
    pe_old = rng.standard_normal((1, 1 + 9, 4)).astype(np.float32)  # 3x3 grid
    head_old = rng.standard_normal((4, 7)).astype(np.float32)
    _save_orbax(tmp_path / "ckvit", {"params": {
        "backbone": {"pos_embd": pe_old},
        "head": {"linear": {"kernel": head_old}},
    }})

    cfg = _cfg(ENABLE=True, POS_EMBED="super-resolution", POP_HEAD=True)
    cfg.TRAIN.AUTO_RESUME = False
    cfg.TRAIN.FINE_TUNE = True
    cfg.TRAIN.CHECKPOINT_FILE_PATH = str(tmp_path / "ckvit")
    # target grid = TRAIN_CROP_SIZE/PATCH_SIZE = 32/16 = 2 -> 4 + cls = 5
    head_fresh = np.zeros((4, 7), np.float32)
    state = _train_state({"params": {
        "backbone": {"pos_embd": np.zeros((1, 5, 4), np.float32)},
        "head": {"linear": {"kernel": head_fresh}},
    }})
    state, _, _ = cu.load_train_checkpoint(cfg, state)
    pe_new = np.asarray(state.variables["params"]["backbone"]["pos_embd"])
    assert pe_new.shape == (1, 5, 4)
    assert np.abs(pe_new).sum() > 0  # adapted weights actually loaded
    np.testing.assert_allclose(pe_new[0, 0], pe_old[0, 0])  # cls kept
    np.testing.assert_allclose(
        np.asarray(state.variables["params"]["head"]["linear"]["kernel"]),
        head_fresh)  # popped -> fresh head preserved
