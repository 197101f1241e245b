"""SSL path: contrastive losses numerics + a HiCo pretrain train step."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from dist_tpu.config import load_config
from dist_tpu.config.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ssl_cfg():
    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    cfg.PRETRAIN = Config({
        "ENABLE": True,
        "GENERATOR": "ContrastiveGenerator",
        "NUM_CLIPS_PER_VIDEO": 2,
        "LOSS": "HiCo",
        "LOSS_WEIGHTS": [1.0],
        "CONTRASTIVE": {
            "TEMPERATURE": 0.1,
            "SIM_FUNC_POS": "linear",
            "SIM_FUNC_NEG": "linear",
            "POS_OPTIM_TARGET": None,
            "INS_MIL": False,
            "WITH_ONE": True,
            "HEAD_MID_DIM": 32,
            "HEAD_OUT_DIM": 16,
            "HEAD_BN": False,
            "FINAL_BN": False,
        },
    })
    cfg.HICO = Config({"LOSS": {"GAMA": 2.0, "VCL_WEIGHT": 1.0,
                                "TCL_WEIGHT": 1.0}})
    return cfg


def _tiny_r2p1d(cfg):
    """Shared tiny R2+1D backbone recipe for the SSL step tests."""
    cfg.VIDEO.BACKBONE.META_ARCH = "ResNet3D"
    cfg.VIDEO.BACKBONE.DEPTH = 10
    cfg.VIDEO.BACKBONE.NUM_FILTERS = [16, 16, 32, 32, 32]
    cfg.VIDEO.BACKBONE.NUM_OUT_FEATURES = 32
    cfg.VIDEO.BACKBONE.KERNEL_SIZE = [[3, 7, 7]] + [[3, 3, 3]] * 4
    cfg.VIDEO.BACKBONE.DOWNSAMPLING = [True, False, True, True, True]
    cfg.VIDEO.BACKBONE.DOWNSAMPLING_TEMPORAL = [False, False, True, True, True]
    cfg.VIDEO.BACKBONE.BRANCH.NAME = "R2Plus1DBranch"
    cfg.VIDEO.BACKBONE.STEM.NAME = "R2Plus1DStem"


def test_instance_discrimination_matches_torch():
    """NT-Xent parity against a direct torch computation of the reference
    formula (contrastive_losses.py:38-65)."""
    from dist_tpu.optim.contrastive import contrastive_instance_discrimination

    cfg = _ssl_cfg()
    B, s, d = 3, 2, 8
    rng = np.random.default_rng(0)
    z = rng.standard_normal((B * s, d)).astype(np.float32)
    z = z / np.linalg.norm(z, axis=1, keepdims=True)

    loss, pos, neg = contrastive_instance_discrimination(
        cfg, jnp.asarray(z), B, s)

    # torch golden (boolean-indexing formulation)
    t = torch.from_numpy(z)
    sim = t @ t.T
    temp = 0.1
    pos_mtx = torch.exp(sim / temp)
    neg_mtx = torch.exp(sim / temp)
    mask_ins = torch.eye(B).repeat_interleave(s, 1).repeat_interleave(s, 0)
    pos_mask = 1 - torch.eye(B * s)
    pos_t = pos_mtx[(mask_ins * pos_mask) != 0].reshape(-1, s - 1)
    neg_t = ((1 - mask_ins) * neg_mtx).sum(0).unsqueeze(1)
    n = pos_t.shape[1]
    loss_t = -((1 / n) * torch.log(pos_t / (pos_t + neg_t)).sum()) / (B * s)
    np.testing.assert_allclose(float(loss), float(loss_t), rtol=1e-5)


def test_hico_pretrain_step():
    """Full SSL train step: tiny R2+1D + ContrastiveHeadTopicPred + HiCo."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    cfg = _ssl_cfg()
    _tiny_r2p1d(cfg)
    cfg.VIDEO.HEAD.NAME = "ContrastiveHeadTopicPred"
    cfg.VIDEO.HEAD.NUM_CLASSES = 0
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.OPTIMIZER.OPTIM_METHOD = "sgd"

    model = build_model(cfg)
    B, n = 2, 2
    video = jax.random.normal(jax.random.PRNGKey(0), (B, n, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1),
                           {"video": video.reshape(B * n, 4, 32, 32, 3)})
    assert "head" in variables
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    batch = {
        "video": video,
        "labels": jnp.zeros((B,), jnp.int32),
        "contrastive": jnp.tile(jnp.arange(n), (B, 1)),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    assert "vcl_loss_debug" in metrics and "tcl_loss_debug" in metrics
    # head params actually moved
    before = jax.tree_util.tree_leaves(state.variables["head"])[0]
    after = jax.tree_util.tree_leaves(new_state.variables["head"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_multi_clip_ssl_decode_and_blur(tmp_path):
    """SSL pretraining decodes NUM_CLIPS_PER_VIDEO temporally DISTINCT clips
    (reference base_dataset.py:285-299); views must differ at the source,
    not just by augmentation, and the SimCLR blur must actually blur."""
    from dist_tpu.data.builder import build_dataset
    from dist_tpu.data.transforms import gaussian_blur_clip

    cfg = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["OUTPUT_DIR", str(tmp_path)])
    cfg.PRETRAIN = Config({
        "ENABLE": True,
        "GENERATOR": "ContrastiveGenerator",
        "NUM_CLIPS_PER_VIDEO": 2,
        "LOSS": "Contrastive",
    })
    cfg.AUGMENTATION.BLUR = 0.0
    ds = build_dataset(cfg, "train")
    clips, _ = ds._decode_video(ds._get_sample_info(0), 0,
                                np.random.default_rng(0))
    assert isinstance(clips, list) and len(clips) == 2
    assert not np.array_equal(clips[0], clips[1])
    item = ds[0]
    assert item["video"].shape[0] == 2
    assert list(item["contrastive"]) == [0, 1]

    # blur: high-frequency energy must drop
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    blurred = gaussian_blur_clip(frames, np.random.default_rng(1),
                                 sigma_range=(2.0, 2.0))
    def hf(x):
        d = np.diff(x.astype(np.float32), axis=2)
        return float(np.abs(d).mean())
    assert hf(blurred) < 0.5 * hf(frames)
    assert blurred.shape == frames.shape and blurred.dtype == np.uint8

    # generator applies blur when AUGMENTATION.BLUR is set (flip path too)
    cfg.AUGMENTATION.BLUR = 1.0
    ds2 = build_dataset(cfg, "train")
    item2 = ds2[0]
    assert item2["video"].shape[0] == 2


def test_hico_plus_plus_head_and_loss_step():
    """HiCo++ pretrain step with the pair-averaged PlusPlus head
    (reference contrastive_head.py:161-217)."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    cfg = _ssl_cfg()
    cfg.PRETRAIN.LOSS = "HiCoPlusPlus"
    cfg.PRETRAIN.NUM_CLIPS_PER_VIDEO = 4
    _tiny_r2p1d(cfg)
    cfg.VIDEO.HEAD.NAME = "ContrastiveHeadTopicPredPlusPlus"
    cfg.VIDEO.HEAD.NUM_CLASSES = 0
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.OPTIMIZER.OPTIM_METHOD = "sgd"

    model = build_model(cfg)
    B, n = 2, 4
    video = jax.random.normal(jax.random.PRNGKey(0), (B, n, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1),
                           {"video": video.reshape(B * n, 4, 32, 32, 3)})
    # the PlusPlus topical map scores PAIR groups: (B*n/2, B*n/2, 2)
    preds, _ = model.apply(variables,
                           {"video": video.reshape(B * n, 4, 32, 32, 3)},
                           train=False)
    assert preds.shape == (B * n // 2, B * n // 2, 2)

    from dist_tpu.tasks.state import make_train_step
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    batch = {"video": video, "labels": jnp.zeros((B,), jnp.int32),
             "contrastive": jnp.tile(jnp.arange(n), (B, 1))}
    _, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))


def test_all_project_configs_load_and_linear_probe_labels():
    """Every shipped YAML loads through the config system; ONLY_LINEAR
    recipes train only head params (the linear-probe path)."""
    import glob
    from dist_tpu.optim.optimizer import FROZEN, param_labels

    repo_cfgs = sorted(glob.glob(
        os.path.join(REPO, "configs/projects/**/*.yaml"), recursive=True))
    assert len(repo_cfgs) >= 60
    linear = []
    for path in repo_cfgs:
        cfg = load_config(path, make_output_dir=False)
        if cfg.TRAIN.get("ONLY_LINEAR"):
            linear.append(cfg)
    assert linear, "no ONLY_LINEAR recipe found"
    params = {"backbone": {"conv": {"kernel": np.zeros((3, 3, 4, 8))}},
              "head": {"linear": {"kernel": np.zeros((8, 5))}}}
    for cfg in linear:  # every linear-probe recipe freezes the backbone
        labels = param_labels(cfg, params)
        assert labels["backbone"]["conv"]["kernel"] == FROZEN
        assert labels["head"]["linear"]["kernel"] != FROZEN


def test_bn_freeze_with_batchnorm_head_trains():
    """BN.FREEZE + a BatchNorm head must run the head on running stats
    instead of raising an immutable-collection error (round-2 review)."""
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.tasks.state import create_train_state, make_train_step

    cfg = _ssl_cfg()
    cfg.PRETRAIN.CONTRASTIVE.HEAD_BN = True
    cfg.BN.FREEZE = True
    _tiny_r2p1d(cfg)
    cfg.VIDEO.HEAD.NAME = "ContrastiveHeadTopicPred"
    cfg.VIDEO.HEAD.NUM_CLASSES = 0
    cfg.DATA.NUM_INPUT_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.OPTIMIZER.OPTIM_METHOD = "sgd"

    model = build_model(cfg)
    B, n = 2, 2
    video = jax.random.normal(jax.random.PRNGKey(0), (B, n, 4, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(1),
                           {"video": video.reshape(B * n, 4, 32, 32, 3)})
    assert "head_stats" in variables
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    batch = {"video": video, "labels": jnp.zeros((B,), jnp.int32),
             "contrastive": jnp.tile(jnp.arange(n), (B, 1))}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # frozen: head BN running stats unchanged
    before = jax.tree_util.tree_leaves(state.variables["head_stats"])
    after = jax.tree_util.tree_leaves(new_state.variables["head_stats"])
    for b_, a_ in zip(before, after):
        np.testing.assert_array_equal(np.asarray(b_), np.asarray(a_))

    # without FREEZE the head stats DO move
    cfg.BN.FREEZE = False
    step2 = jax.jit(make_train_step(model, cfg, tx, lr_fn))
    new_state2, _ = step2(state, batch, jax.random.PRNGKey(2))
    moved = any(
        not np.allclose(np.asarray(b_), np.asarray(a_))
        for b_, a_ in zip(
            jax.tree_util.tree_leaves(state.variables["head_stats"]),
            jax.tree_util.tree_leaves(new_state2.variables["head_stats"])))
    assert moved


def test_device_aug_never_flips_ssv2():
    from dist_tpu.ops.augment_device import DeviceAugConfig

    cfg = _ssl_cfg()
    cfg.TRAIN.DATASET = "ssv2"
    assert DeviceAugConfig.from_cfg(cfg).flip == 0.0
    cfg.TRAIN.DATASET = "kinetics400"
    assert DeviceAugConfig.from_cfg(cfg).flip == 0.5


def test_ssl_use_gpu_device_aug_per_view():
    """USE_GPU SSL: the generator skips photometric ops (no double aug)
    and the train step's device augmentation draws independent jitter per
    VIEW (views are flattened before device_augment, tasks/state.py)."""
    import numpy as np
    from dist_tpu.ops.augment_device import DeviceAugConfig, device_augment
    from dist_tpu.ssl.generator import ContrastiveGenerator

    cfg = _ssl_cfg()
    cfg.AUGMENTATION.USE_GPU = True
    cfg.AUGMENTATION.BRIGHTNESS = 0.8
    cfg.AUGMENTATION.CONTRAST = 0.0
    cfg.AUGMENTATION.SATURATION = 0.0
    cfg.AUGMENTATION.HUE = 0.0
    cfg.AUGMENTATION.GRAYSCALE = 0.0
    cfg.AUGMENTATION.COLOR = 1.0
    cfg.AUGMENTATION.BLUR = 0.0
    cfg.DATA.TRAIN_CROP_SIZE = 16
    gen = ContrastiveGenerator(cfg, "train")
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    views, _ = gen([frames], {}, rng)
    # host path applied only crop/flip: every view pixel value exists in
    # the source frame set (photometric ops would synthesize new values)
    src_vals = set(np.unique(frames).tolist())
    assert set(np.unique(views).tolist()) <= src_vals

    # device aug on the flattened views: per-view brightness factors differ
    flat = jnp.asarray(views, jnp.float32)[None].reshape(-1, *views.shape[1:]) / 255.0
    c = DeviceAugConfig.from_cfg(cfg)
    assert c.color_p == 1.0 and c.blur_p == 0.0
    out = device_augment(jax.random.PRNGKey(0), flat, c)
    r0 = float(np.asarray(out[0]).mean()) / max(float(flat[0].mean()), 1e-6)
    r1 = float(np.asarray(out[1]).mean()) / max(float(flat[1].mean()), 1e-6)
    assert abs(r0 - r1) > 1e-3  # independent per-view draws
