"""Mesh/sharding: TP param placement + dp x tp train step on virtual mesh."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from dist_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, _tp_spec_for, shard_params)


def test_tp_specs():
    from jax.sharding import PartitionSpec as P
    assert _tp_spec_for("visual/resblocks/block/attn/in_proj_weight", 3) == \
        P(None, None, MODEL_AXIS)
    assert _tp_spec_for("visual/resblocks/block/mlp/c_proj/kernel", 3) == \
        P(None, MODEL_AXIS, None)
    assert _tp_spec_for("visual/class_embedding", 1) == P()


def test_shard_params_places_tp():
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
    tree = {
        "visual": {"resblocks": {"block": {"mlp": {"c_fc": {
            "kernel": jnp.zeros((2, 64, 256))}}}}},
        "scalar": jnp.zeros(()),
    }
    placed = shard_params(mesh, tree)
    k = placed["visual"]["resblocks"]["block"]["mlp"]["c_fc"]["kernel"]
    # sharded over the model axis on the last dim: each shard holds 128 cols
    assert k.sharding.shard_shape(k.shape)[-1] == 128


def test_dryrun_multichip_dp_tp():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_tp_step_preserves_param_shardings_and_data_sharded_batch():
    """dp x tp train step: updated params must RETAIN their model-axis
    shardings (no silent replication / all-gather of weights into the
    state), and the batch constraint pins activations to the data axis."""
    import os
    from jax.sharding import NamedSharding, PartitionSpec as P
    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.parallel.mesh import shard_batch
    from dist_tpu.tasks.state import create_train_state, make_train_step

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    devs = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, (DATA_AXIS, MODEL_AXIS))
    cfg = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["TRAIN.BATCH_SIZE", "8", "OUTPUT_DIR", "/tmp/tp_step_test"])
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (8, 4, 64, 64, 3), 0, 255,
                               jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video.astype(jnp.float32)})
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)

    with mesh:
        state = shard_params(mesh, state)
        specs_before = jax.tree_util.tree_map(
            lambda x: x.sharding.spec if hasattr(x, "sharding") else None,
            state.variables)
        batch = shard_batch(mesh, {
            "video": video, "labels": jnp.arange(8, dtype=jnp.int32) % 12})
        batch["text_features"] = jax.random.normal(rng, (12, 32), jnp.float32)
        step = jax.jit(make_train_step(model, cfg, tx, lr_fn, mesh=mesh))
        new_state, metrics = step(state, batch, rng)
        jax.block_until_ready(metrics["loss"])
        specs_after = jax.tree_util.tree_map(
            lambda x: x.sharding.spec if hasattr(x, "sharding") else None,
            new_state.variables)
    # at least one param is model-axis sharded before AND after the step
    def flat(t):
        return {"/".join(map(str, p)): v
                for p, v in jax.tree_util.tree_flatten_with_path(t)[0]}
    fb, fa = flat(specs_before), flat(specs_after)
    def norm(spec):
        t = tuple(spec) if spec is not None else ()
        while t and t[-1] is None:
            t = t[:-1]
        return t
    tp_keys = [k for k, v in fb.items() if v is not None and MODEL_AXIS in str(v)]
    assert tp_keys, "no tensor-parallel shardings were placed"
    for k in tp_keys:
        assert norm(fa[k]) == norm(fb[k]), (
            f"{k} lost its TP sharding: {fb[k]} -> {fa[k]}")


def test_shard_frames_eval_matches_replicated():
    """TPU.SHARD_FRAMES: batch-1 eval with the FRAME axis sharded over the
    data axis produces the same predictions as unsharded eval (the frozen
    tower is frame-parallel — single-video multi-chip inference)."""
    import os
    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.parallel.mesh import build_mesh, shard_batch
    from dist_tpu.tasks.state import TrainState, make_eval_step

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["DATA.NUM_INPUT_FRAMES", "8", "TEST.BATCH_SIZE", "1",
              # fp32: sharded reductions reorder sums; at bf16 that shows
              # up as ~0.3% softmax wiggle, at fp32 it stays ~1e-6
              "TRAIN.MIXED_PRECISION", "false"],
        make_output_dir=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    video = jax.random.randint(rng, (1, 8, 64, 64, 3), 0, 255,
                               jnp.int32).astype(jnp.uint8)
    variables = model.init(rng, {"video": video.astype(jnp.float32)})
    state = TrainState(step=jnp.zeros((), jnp.int32), variables=variables,
                       opt_state=(), ema_variables=None)
    text = jax.random.normal(rng, (12, 32), jnp.float32)
    mesh = build_mesh(cfg)
    assert mesh.devices.size == 8

    step = jax.jit(make_eval_step(model, cfg))
    with mesh:
        # batch 1 cannot shard over 8 devices on the batch axis — the
        # baseline passes host arrays (jit replicates them)
        b_rep = {"video": video, "labels": jnp.zeros((1,), jnp.int32)}
        b_fr = shard_batch(mesh, {"video": video, "labels": jnp.zeros((1,), jnp.int32)},
                           shard_frames=True)
        # frame sharding really placed the T axis over the data axis
        assert "data" in str(b_fr["video"].sharding.spec)
        b_rep["text_features"] = text
        b_fr["text_features"] = text
        out_rep = np.asarray(step(state, b_rep)["preds"])
        out_fr = np.asarray(step(state, b_fr)["preds"])
    np.testing.assert_allclose(out_fr, out_rep, atol=2e-5, rtol=1e-4)


def test_shard_frames_full_test_task():
    """The whole test() task under TPU.SHARD_FRAMES: loader batch stays at
    TEST.BATCH_SIZE (not scaled to the device count) and the multi-view
    metrics come out identical to the plain data-parallel run."""
    import os
    from dist_tpu.config import load_config
    from dist_tpu.tasks.test import test as test_task

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = "/tmp/shard_frames_task_test"
    base_opts = ["TEST.BATCH_SIZE", "1", "TEST.NUM_SAMPLES_LIMIT", "8",
                 "DATA.NUM_INPUT_FRAMES", "8",
                 "TRAIN.MIXED_PRECISION", "false",
                 "TRAIN.ENABLE", "false", "OUTPUT_DIR", out]
    cfg = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=base_opts)
    plain = test_task(cfg)

    cfg2 = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=base_opts + ["TPU.SHARD_FRAMES", "true"])
    sharded = test_task(cfg2)
    assert plain["top1_acc"] == sharded["top1_acc"]
    assert plain["top5_acc"] == sharded["top5_acc"]


def test_l14_pod8_recipe_steps_on_cpu_mesh():
    """The shipped ViT-L/14 pod recipe (configs/projects/dist/ssv2/
    vit-l14-32+64f-pod8.yaml: 8-way dp + TPU.FSDP + TPU.REMAT) builds,
    FSDP-shards its 24x1024 tower, and executes one full train step at
    production tower geometry (24 layers, width 1024, 257 tokens) on the
    8-device CPU mesh. Dense frames are cut 64 -> 4 and batch to 1/shard
    for CPU runtime — the frame count changes HBM pressure (measured on
    the real chip, README), not the sharding rules under test."""
    import os

    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model
    from dist_tpu.optim.optimizer import construct_optimizer
    from dist_tpu.parallel.mesh import build_mesh, shard_batch
    from dist_tpu.tasks.state import (create_train_state, init_variables,
                                      make_train_step)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs/projects/dist/ssv2/vit-l14-32+64f-pod8.yaml"),
        opts=["DATA.NUM_INPUT_FRAMES", "4",
              "TRAIN.BATCH_SIZE", "1",
              "VIDEO.BACKBONE.PRETRAIN_WEIGHT_PATH", "",
              "VIDEO.BACKBONE.LOCAL_PRETRAIN_WEIGHT_PATH", "",
              "VIDEO.HEAD.NUM_CLASSES", "12"],
        make_output_dir=False)
    assert cfg.TPU.FSDP and cfg.TPU.REMAT

    mesh = build_mesh(cfg)
    assert mesh.shape[DATA_AXIS] == 8
    model = build_model(cfg)
    variables = init_variables(cfg, model, (4, 224, 224, 3))
    tx, lr_fn = construct_optimizer(cfg, variables, steps_per_epoch=10)
    state = create_train_state(variables, tx)
    with mesh:
        state = shard_params(mesh, state, fsdp=True)
        # the tower's stacked per-layer params must actually be sharded
        # (each device holds 1/8 of the largest free dim), not replicated
        blk = state.variables["params"]["visual"]["resblocks"]["block"]
        leaf = blk["mlp"]["c_fc"]["kernel"]  # (24, 1024, 4096)
        shard = leaf.sharding.shard_shape(leaf.shape)
        assert int(np.prod(shard)) == int(np.prod(leaf.shape)) // 8, (
            leaf.shape, shard)

        step = jax.jit(make_train_step(model, cfg, tx, lr_fn, mesh=mesh))
        rng = jax.random.PRNGKey(0)
        video = np.random.default_rng(0).integers(
            0, 255, (8, 4, 224, 224, 3), np.uint8)
        batch = shard_batch(mesh, {
            "video": video, "labels": np.zeros((8,), np.int64)})
        batch["text_features"] = jnp.asarray(
            np.random.default_rng(1).standard_normal((12, 768)), jnp.float32)
        state, metrics = step(state, batch, rng)
        loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss)
