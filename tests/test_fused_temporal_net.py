"""Fused TemporalNet Pallas kernel parity: fwd and bwd against the flax
module (jax.grad through the unfused path), in Pallas interpret mode on
CPU at the production B/16 train geometry (T=16, 14x14, C=F=96, k=3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dist_tpu.models.dist.dist_net import DiSTConfig, TemporalNet
from dist_tpu.ops import temporal_net as tn

CFG = DiSTConfig(selected_layers=tuple(range(12)), num_frames=16, alpha=2)
B, T, H, W, C = 2, 16, 14, 14, 96
K = CFG.temporal_kernel_size
RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def setup():
    module = TemporalNet(CFG)
    x = jnp.asarray(RNG.standard_normal((B, T, H, W, C)), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x)
    # non-trivial params so LN/bias grads aren't degenerate
    variables = jax.tree_util.tree_map(
        lambda p: p + jnp.asarray(
            RNG.standard_normal(p.shape) * 0.05, p.dtype), variables)
    return module, variables, x


def _flat(variables):
    p = variables["params"]
    return (p["ln"]["scale"], p["ln"]["bias"], p["c_fc1"]["kernel"],
            p["c_fc1"]["bias"], p["c_fc2"]["kernel"], p["c_fc2"]["bias"])


def test_reference_matches_module(setup):
    module, variables, x = setup
    want = module.apply(variables, x)
    got = tn._reference(x, *_flat(variables))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_fwd_interpret(setup):
    module, variables, x = setup
    want = module.apply(variables, x)
    got = tn._pallas_fwd(x, *_flat(variables), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_pallas_bwd_interpret(setup):
    module, variables, x = setup
    g = jnp.asarray(RNG.standard_normal((B, T, H, W, C)), jnp.float32)

    def loss(v, xx):
        return jnp.sum(module.apply(v, xx) * g)

    want_dv, want_dx = jax.grad(loss, argnums=(0, 1))(variables, x)
    wp = want_dv["params"]

    outs = tn._pallas_bwd(x, g, *_flat(variables), interpret=True)
    dx, dlns, dlnb, dw1, db1, dw2, db2 = outs

    np.testing.assert_allclose(np.asarray(dx), np.asarray(want_dx),
                               atol=2e-4, rtol=1e-4)
    for got, want, name in [
            (dlns, wp["ln"]["scale"], "ln.scale"),
            (dlnb, wp["ln"]["bias"], "ln.bias"),
            (dw1, wp["c_fc1"]["kernel"], "c_fc1.kernel"),
            (db1, wp["c_fc1"]["bias"], "c_fc1.bias"),
            (dw2, wp["c_fc2"]["kernel"], "c_fc2.kernel"),
            (db2, wp["c_fc2"]["bias"], "c_fc2.bias")]:
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=5e-3, rtol=5e-4,
            err_msg=f"grad mismatch: {name}")


def test_wired_into_ladder_param_tree_and_parity():
    """TemporalNet(fused=True) must create a BIT-IDENTICAL param tree to
    the unfused module and (on the CPU reference path) the same outputs
    and gradients — the TPU.FUSED_TEMPORAL_NET flag is checkpoint-neutral."""
    x = jnp.asarray(RNG.standard_normal((2, T, H, W, C)), jnp.float32)
    plain = TemporalNet(CFG, fused=False)
    fused = TemporalNet(CFG, fused=True)
    v_plain = plain.init(jax.random.PRNGKey(7), x)
    v_fused = fused.init(jax.random.PRNGKey(7), x)
    assert (jax.tree_util.tree_structure(v_plain)
            == jax.tree_util.tree_structure(v_fused))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), v_plain, v_fused)

    out_p = plain.apply(v_plain, x)
    out_f = fused.apply(v_plain, x)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p),
                               atol=1e-5, rtol=1e-5)

    gp = jax.grad(lambda v: jnp.sum(plain.apply(v, x) ** 2))(v_plain)
    gf = jax.grad(lambda v: jnp.sum(fused.apply(v, x) ** 2))(v_plain)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3), gp, gf)


def test_flag_allowed_on_cpu_mesh():
    """TPU.FUSED_TEMPORAL_NET is single-chip-only on TPU backends (the
    kernel has no GSPMD rule), but on CPU the op falls back to shardable
    jnp code — the multi-device CPU mesh used by tests/dryruns must keep
    building and running with the flag on."""
    import os
    from dist_tpu.config import load_config
    from dist_tpu.models.base.models import build_model

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=["TPU.FUSED_TEMPORAL_NET", "true"], make_output_dir=False)
    model = build_model(cfg)  # would assert on a multi-chip TPU backend
    video = jnp.zeros((1, 4, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), {"video": video})
    tf = jnp.zeros((12, model.module.arch.embed_dim))
    preds, _ = model.apply(variables,
                           {"video": video, "text_features": tf},
                           train=False)
    assert preds.shape == (1, 12)


def test_custom_vjp_cpu_path(setup):
    """On CPU the public op runs the jnp reference with jax.vjp — the whole
    custom_vjp plumbing must still produce module-identical grads."""
    module, variables, x = setup
    g = jnp.asarray(RNG.standard_normal((B, T, H, W, C)), jnp.float32)

    def loss_fused(xx, *params):
        return jnp.sum(tn.fused_temporal_net(xx, *params) * g)

    def loss_mod(v, xx):
        return jnp.sum(module.apply(v, xx) * g)

    grads = jax.grad(loss_fused, argnums=tuple(range(7)))(
        x, *_flat(variables))
    want_dv, want_dx = jax.grad(loss_mod, argnums=(0, 1))(variables, x)
    wp = want_dv["params"]
    np.testing.assert_allclose(np.asarray(grads[0]), np.asarray(want_dx),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[3]),
                               np.asarray(wp["c_fc1"]["kernel"]),
                               atol=5e-3, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(grads[5]),
                               np.asarray(wp["c_fc2"]["kernel"]),
                               atol=5e-3, rtol=5e-4)
