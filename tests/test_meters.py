"""Meter tests vs hand-computed values (SURVEY section 4's test pyramid)."""

import os

import numpy as np
import pytest

from dist_tpu.config import load_config
from dist_tpu.utils.meters import EpicKitchenMeter, ScalarMeter, TestMeter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg():
    return load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                       make_output_dir=False)


def test_scalar_meter_window():
    m = ScalarMeter(window_size=3)
    for v in (1.0, 2.0, 3.0, 4.0):
        m.add_value(v)
    assert m.get_win_median() == 3.0
    assert m.get_global_avg() == 2.5


def test_testmeter_multiview_ensemble():
    """2 videos x 3 views: per-video summed scores decide top-1."""
    m = TestMeter(num_videos=2, num_clips=3, num_cls=4, cfg=_cfg())
    # video 0 (ids 0..2): class 1 wins on aggregate; video 1 (ids 3..5): class 2
    preds = np.array([
        [0.1, 0.6, 0.2, 0.1],
        [0.2, 0.5, 0.2, 0.1],
        [0.5, 0.3, 0.1, 0.1],   # an off view; sum still favors class 1
        [0.1, 0.1, 0.7, 0.1],
        [0.1, 0.2, 0.6, 0.1],
        [0.1, 0.1, 0.5, 0.3],
    ])
    labels = np.array([1, 1, 1, 2, 2, 2])
    ids = np.arange(6)
    m.update_stats(preds, labels, ids)
    stats = m.finalize_metrics(ks=(1,))
    assert stats["top1_acc"] == "100.00"
    assert (m.clip_count == 3).all()


def test_epic_meter_joint_action():
    m = EpicKitchenMeter(num_videos=1, num_clips=2, num_cls=(3, 4), cfg=_cfg())
    verb = np.array([[0.7, 0.2, 0.1], [0.6, 0.3, 0.1]])
    noun = np.array([[0.1, 0.8, 0.05, 0.05], [0.2, 0.7, 0.05, 0.05]])
    labels = {"verb_class": np.array([0, 0]), "noun_class": np.array([1, 1])}
    m.update_stats({"verb_class": verb, "noun_class": noun}, labels,
                   np.array([0, 1]))
    stats = m.finalize_metrics(ks=(1,))
    assert stats["verb_top1_acc"] == "100.00"
    assert stats["noun_top1_acc"] == "100.00"
    assert stats["action_top1_acc"] == "100.00"


@pytest.mark.slow  # heavy compile (fast-lane budget, README: Tests)
def test_feature_map_intermediates():
    """VISUALIZATION analog: capture_intermediates through the model."""
    import jax
    import jax.numpy as jnp
    from dist_tpu.models.base.models import build_model

    cfg = _cfg()
    cfg.VIDEO.BACKBONE.META_ARCH = "ResNet3D"
    cfg.VIDEO.BACKBONE.DEPTH = 10
    cfg.VIDEO.BACKBONE.NUM_FILTERS = [8, 8, 16, 16, 16]
    cfg.VIDEO.BACKBONE.NUM_OUT_FEATURES = 16
    cfg.VIDEO.BACKBONE.KERNEL_SIZE = [[3, 7, 7]] + [[3, 3, 3]] * 4
    cfg.VIDEO.BACKBONE.DOWNSAMPLING = [True, False, True, True, True]
    cfg.VIDEO.BACKBONE.DOWNSAMPLING_TEMPORAL = [False] * 5
    cfg.VIDEO.BACKBONE.BRANCH.NAME = "R2Plus1DBranch"
    cfg.VIDEO.BACKBONE.STEM.NAME = "R2Plus1DStem"
    cfg.VIDEO.HEAD.NAME = "BaseHead"
    cfg.VIDEO.HEAD.NUM_CLASSES = 3
    cfg.DATA.NUM_INPUT_FRAMES = 2

    model = build_model(cfg)
    video = jnp.zeros((1, 2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    preds, feats = model.apply_with_intermediates(variables, {"video": video})
    assert preds.shape == (1, 3)
    assert "conv1" in feats and "conv2" in feats


def test_testmeter_dedups_padded_views():
    """The loader pads the final batch by cycling earlier indices; a
    duplicated view must not be double-counted (round-1 review finding)."""
    m = TestMeter(num_videos=2, num_clips=3, num_cls=4, cfg=_cfg())
    preds = np.array([
        [0.1, 0.6, 0.2, 0.1],
        [0.2, 0.5, 0.2, 0.1],
        [0.5, 0.3, 0.1, 0.1],
        [0.1, 0.1, 0.7, 0.1],
        [0.1, 0.2, 0.6, 0.1],
        [0.1, 0.1, 0.5, 0.3],
    ])
    labels = np.array([1, 1, 1, 2, 2, 2])
    m.update_stats(preds, labels, np.arange(6))
    expected = m.video_preds.copy()
    # padded batch re-delivers views 0 and 1
    m.update_stats(preds[:2], labels[:2], np.array([0, 1]))
    assert np.array_equal(m.video_preds, expected)
    assert (m.clip_count == 3).all()
    m.reset()
    m.update_stats(preds, labels, np.arange(6))
    assert np.array_equal(m.video_preds, expected)  # reset clears seen


def test_epic_meter_dedups_padded_views():
    m = EpicKitchenMeter(num_videos=1, num_clips=2, num_cls=(3, 4), cfg=_cfg())
    verb = np.array([[0.7, 0.2, 0.1], [0.6, 0.3, 0.1]])
    noun = np.array([[0.1, 0.8, 0.05, 0.05], [0.2, 0.7, 0.05, 0.05]])
    labels = {"verb_class": np.array([0, 0]), "noun_class": np.array([1, 1])}
    m.update_stats({"verb_class": verb, "noun_class": noun}, labels,
                   np.array([0, 1]))
    expected = {k: v.copy() for k, v in m.video_preds.items()}
    m.update_stats({"verb_class": verb[:1], "noun_class": noun[:1]},
                   {"verb_class": labels["verb_class"][:1],
                    "noun_class": labels["noun_class"][:1]}, np.array([0]))
    for k in expected:
        assert np.array_equal(m.video_preds[k], expected[k])
    assert (m.clip_count == 2).all()


def test_train_meter_eta_uses_per_iteration_time():
    """iter_tic RESETS the timer (reference meters.py:563-567): seconds()
    is the LAST iteration's time, so the ETA = per-iter x remaining, not
    the LOG_PERIOD window sum x remaining (a ~10x inflation)."""
    import time as _time
    from dist_tpu.utils.meters import TrainMeter

    cfg = load_config(os.path.join(
        REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["LOG_PERIOD", "5", "TRAIN.NUM_FOLDS", "1",
              "OPTIMIZER.MAX_EPOCH", "1"], make_output_dir=False)
    meter = TrainMeter(100, cfg)
    for _ in range(4):
        meter.iter_tic()
        _time.sleep(0.01)
        meter.iter_toc()
    per_iter = meter.iter_timer.seconds()
    assert 0.005 < per_iter < 0.05, per_iter  # one iteration, not the sum


def test_topks_correct_weights_exclude_pads():
    """Weighted top-k counts: pad rows (weight 0) contribute nothing, so the
    masked batch reproduces the unpadded counts exactly."""
    import jax.numpy as jnp
    from dist_tpu.utils.metrics import topks_correct

    preds = jnp.asarray([[0.9, 0.1, 0.0],   # correct (label 0)
                         [0.1, 0.8, 0.1],   # correct (label 1)
                         [0.7, 0.2, 0.1],   # wrong   (label 2)
                         [0.9, 0.1, 0.0]])  # pad duplicate of row 0
    labels = jnp.asarray([0, 1, 2, 0])
    weights = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    c1, c5 = topks_correct(preds, labels, (1, 5), weights=weights)
    u1, u5 = topks_correct(preds[:3], labels[:3], (1, 5))
    assert float(c1) == float(u1) == 2.0
    assert float(c5) == float(u5) == 3.0


def test_eval_step_mask_matches_unpadded_batch():
    """make_eval_step with a loader pad mask returns the same errors as the
    unpadded batch, plus num_valid for the meter weighting (fixes the
    in-train val bias when len(val) % global_batch != 0)."""
    import jax
    import jax.numpy as jnp
    from dist_tpu.tasks.state import TrainState, make_eval_step

    class _Scorer:
        """Duck-typed model: scores = first 4 pixels of each clip."""

        def apply(self, variables, inputs, train=False):
            v = inputs["video"]
            preds = v.reshape(v.shape[0], -1)[:, :4]
            return preds, preds

    cfg = load_config(os.path.join(REPO, "configs/pool/base.yaml"),
                      make_output_dir=False)
    step = make_eval_step(_Scorer(), cfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), variables={},
                       opt_state=(), ema_variables=None)
    video = jax.random.normal(jax.random.PRNGKey(0), (6, 2, 4, 4, 3))
    labels = jnp.asarray([0, 1, 2, 3, 0, 1])
    # pad the batch to 8 by repeating the first two rows, mask them out
    padded = jnp.concatenate([video, video[:2]])
    plabels = jnp.concatenate([labels, labels[:2]])
    mask = jnp.asarray([1.0] * 6 + [0.0] * 2)

    exact = step(state, {"video": video, "labels": labels})
    masked = step(state, {"video": padded, "labels": plabels, "mask": mask})
    assert float(masked["num_valid"]) == 6.0
    assert abs(float(masked["top1_err"]) - float(exact["top1_err"])) < 1e-5
    assert abs(float(masked["top5_err"]) - float(exact["top5_err"])) < 1e-5
