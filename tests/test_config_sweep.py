"""Every shipped config loads and builds its model.

The reference ships 78 project configs and no check that they stay
consistent with the code; key renames or registry drift rot silently.
Here every YAML under configs/projects must (a) survive the full
_BASE/_BASE_RUN/_BASE_MODEL merge + schema, and (b) resolve all its
registry names by constructing the model module tree (no param init — the
expensive part is covered per-family by the backbone/e2e suites).
"""

import glob
import os

import pytest

from dist_tpu.config import load_config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs/projects/**/*.yaml"),
                           recursive=True))


def test_sweep_found_the_tree():
    assert len(CONFIGS) >= 60, len(CONFIGS)


@pytest.mark.parametrize("path", CONFIGS,
                         ids=[os.path.relpath(p, os.path.join(
                             REPO, "configs/projects")) for p in CONFIGS])
def test_config_loads_and_builds(path):
    from dist_tpu.models.base.models import build_model

    cfg = load_config(path, make_output_dir=False)
    model = build_model(cfg)
    assert model is not None