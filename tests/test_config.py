import os

import pytest

from dist_tpu.config import load_config
from dist_tpu.config.config import Config, merge_opts, _deep_merge

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST_CFG = os.path.join(REPO, "configs/projects/dist/ssv2/vit-b16-8+16f.yaml")


def test_base_chain_merge():
    cfg = load_config(DIST_CFG, make_output_dir=False)
    # leaf overrides
    assert cfg.DATA.NUM_INPUT_FRAMES == 16
    assert cfg.DATA.SPARSE_SAMPLE_ALPHA == 2
    assert cfg.VIDEO.BACKBONE.DIST.ENABLE is True
    assert cfg.VIDEO.BACKBONE.DIST.SELECTED_LAYERS == list(range(12))
    # from _BASE parent (vit_base_16_ssv2.yaml)
    assert cfg.TRAIN.BATCH_SIZE == 32
    assert cfg.VIDEO.HEAD.NUM_CLASSES == 174
    assert cfg.DATA.MEAN == [0.48145466, 0.4578275, 0.40821073]
    # from _BASE_MODEL grandparent
    assert cfg.VIDEO.BACKBONE.META_ARCH == "ClipVisionTextTransformer"
    assert cfg.VIDEO.BACKBONE.META_ARCH_NAME == "ViT-B-16"
    # from base.yaml schema
    assert cfg.BN.EPS == 1e-5
    # exponent-string coercion
    assert isinstance(cfg.OPTIMIZER.BASE_LR, float)
    assert cfg.OPTIMIZER.BASE_LR == pytest.approx(3.2e-5)


def test_cli_overrides_typed():
    cfg = load_config(
        DIST_CFG,
        opts=["TRAIN.BATCH_SIZE", "8", "DATA.SPARSE_SAMPLE_ALPHA", "4",
              "VIDEO.BACKBONE.FREEZE_VISUAL", "false", "OUTPUT_DIR", "/tmp/x"],
        make_output_dir=False,
    )
    assert cfg.TRAIN.BATCH_SIZE == 8
    assert cfg.DATA.SPARSE_SAMPLE_ALPHA == 4
    assert cfg.VIDEO.BACKBONE.FREEZE_VISUAL is False
    assert cfg.OUTPUT_DIR == "/tmp/x"


def test_cli_override_rejects_unknown_key():
    with pytest.raises(AssertionError):
        load_config(DIST_CFG, opts=["NOPE.NOPE", "1"], make_output_dir=False)


def test_deep_merge_child_wins():
    base = {"A": {"B": 1, "C": 2}, "D": 3}
    new = {"A": {"B": 9}, "E": 4}
    out = _deep_merge(base, new)
    assert out == {"A": {"B": 9, "C": 2}, "D": 3, "E": 4}


def test_config_mutation_syncs_dict():
    cfg = Config({"A": {"B": 1}})
    cfg.A.B = 7
    assert cfg.A.cfg_dict["B"] == 7
    c2 = cfg.deep_copy()
    c2.A.B = 3
    assert cfg.A.B == 7


def test_merge_opts_depth4():
    d = {"A": {"B": {"C": {"D": 1}}}}
    merge_opts(d, ["A.B.C.D", "5"])
    assert d["A"]["B"]["C"]["D"] == 5


def test_merge_keeps_new_keys_containing_base(tmp_path):
    """A child's new key containing 'BASE' must survive the merge (the
    reference's substring check at utils/config.py:173 silently DROPS e.g.
    OPTIMIZER.BASE_LR when its parent doesn't define it — fixed here: only
    the exact _BASE/_BASE_RUN/_BASE_MODEL keys are reserved)."""
    parent = tmp_path / "parent.yaml"
    parent.write_text("OPTIMIZER:\n  LR_POLICY: cosine\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        "_BASE: parent.yaml\nOPTIMIZER:\n  BASE_LR: 0.0001\n"
        "MY_BASE_PATH: /data\n")
    from dist_tpu.config.config import _load_yaml_tree
    tree = _load_yaml_tree(str(child))
    assert tree["OPTIMIZER"]["BASE_LR"] == 0.0001
    assert tree["OPTIMIZER"]["LR_POLICY"] == "cosine"
    assert tree["MY_BASE_PATH"] == "/data"
