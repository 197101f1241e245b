"""Numeric torch-golden parity for the S3DG and SlowFast building blocks
(the TAdaConv identity already has one in test_conv_backbones): identical
weights -> identical outputs, eval mode (BN running stats)."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def _conv3d_w(torch_w):
    # (O,I,D,H,W) -> flax (D,H,W,I,O)
    return jnp.asarray(np.transpose(torch_w, (2, 3, 4, 1, 0)))


def _to_torch(x_ndhwc):
    return torch.from_numpy(np.transpose(x_ndhwc, (0, 4, 1, 2, 3)))


def _from_torch(y):
    return np.transpose(y.detach().numpy(), (0, 2, 3, 4, 1))


def _bn_params(c, rng):
    return {
        "scale": rng.normal(1, 0.1, c).astype(np.float32),
        "bias": rng.normal(0, 0.1, c).astype(np.float32),
        "mean": rng.normal(0, 0.5, c).astype(np.float32),
        "var": rng.uniform(0.5, 2.0, c).astype(np.float32),
    }


def _torch_bn(c, p):
    bn = tnn.BatchNorm3d(c, eps=1e-5, momentum=0.1)
    bn.weight.data = torch.from_numpy(p["scale"])
    bn.bias.data = torch.from_numpy(p["bias"])
    bn.running_mean.data = torch.from_numpy(p["mean"])
    bn.running_var.data = torch.from_numpy(p["var"])
    bn.eval()
    return bn


def test_self_gating_matches_torch():
    """S3D-G feature gate (reference s3dg_branch.py:92-102)."""
    from dist_tpu.models.backbones.s3dg import SelfGating

    rng = np.random.default_rng(0)
    c = 8
    x = rng.normal(size=(2, 3, 4, 4, c)).astype(np.float32)
    w = rng.normal(size=(c, c)).astype(np.float32)  # flax kernel (in, out)
    b = rng.normal(size=(c,)).astype(np.float32)

    mod = SelfGating()
    out = mod.apply({"params": {"fc": {"kernel": jnp.asarray(w),
                                       "bias": jnp.asarray(b)}}},
                    jnp.asarray(x))

    # torch: spatiotemporal avg pool -> Linear -> sigmoid -> scale
    xt = _to_torch(x)
    avg = xt.mean(dim=(2, 3, 4))
    gate = torch.sigmoid(F.linear(avg, torch.from_numpy(w.T),
                                  torch.from_numpy(b)))
    expect = _from_torch(xt * gate[:, :, None, None, None])
    np.testing.assert_allclose(np.asarray(out), expect, atol=1e-5)


def test_stconv3d_matches_torch():
    """Separable (1,k,k)+(k,1,1) conv with BN+relu each
    (reference s3dg_branch.py:104-150), eval mode."""
    from dist_tpu.models.backbones.s3dg import STConv3d

    rng = np.random.default_rng(1)
    cin, cout, k = 6, 8, 3
    x = rng.normal(size=(2, 5, 6, 6, cin)).astype(np.float32)
    w_sp = rng.normal(size=(cout, cin, 1, k, k)).astype(np.float32) * 0.2
    w_t = rng.normal(size=(cout, cout, k, 1, 1)).astype(np.float32) * 0.2
    bn1, bn2 = _bn_params(cout, rng), _bn_params(cout, rng)

    variables = {
        "params": {
            "conv": {"kernel": _conv3d_w(w_sp)},
            "bn": {"scale": jnp.asarray(bn1["scale"]),
                   "bias": jnp.asarray(bn1["bias"])},
            "conv2": {"kernel": _conv3d_w(w_t)},
            "bn2": {"scale": jnp.asarray(bn2["scale"]),
                    "bias": jnp.asarray(bn2["bias"])},
        },
        "batch_stats": {
            "bn": {"mean": jnp.asarray(bn1["mean"]),
                   "var": jnp.asarray(bn1["var"])},
            "bn2": {"mean": jnp.asarray(bn2["mean"]),
                    "var": jnp.asarray(bn2["var"])},
        },
    }
    out = STConv3d(features=cout, kernel=k).apply(
        variables, jnp.asarray(x), train=False)

    xt = _to_torch(x)
    y = F.conv3d(xt, torch.from_numpy(w_sp), padding=(0, k // 2, k // 2))
    y = torch.relu(_torch_bn(cout, bn1)(y))
    y = F.conv3d(y, torch.from_numpy(w_t), padding=(k // 2, 0, 0))
    y = torch.relu(_torch_bn(cout, bn2)(y))
    np.testing.assert_allclose(np.asarray(out), _from_torch(y),
                               atol=2e-4, rtol=1e-4)


def test_fuse_fast_to_slow_matches_torch():
    """SlowFast lateral connection: stride-alpha temporal conv on the fast
    stream + BN + relu, concatenated into the slow channels
    (reference slowfast.py:119-155)."""
    import os
    from dist_tpu.config import load_config
    from dist_tpu.models.backbones.slowfast import FuseFastToSlow

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(
        os.path.join(REPO, "configs/projects/dist/test/tiny_synth.yaml"),
        make_output_dir=False)
    from dist_tpu.config.config import Config
    cfg.VIDEO.BACKBONE.SLOWFAST = Config({
        "MODE": "slowfast", "KERNEL_SIZE": 5, "ALPHA": 4,
        "CONV_CHANNEL_RATIO": 2, "FUSION_CONV_BIAS": False,
        "FUSION_BN": True, "FUSION_RELU": True, "BETA_INV": 8})

    rng = np.random.default_rng(2)
    c_fast, alpha, k = 4, 4, 5
    x_slow = rng.normal(size=(2, 2, 4, 4, 16)).astype(np.float32)
    x_fast = rng.normal(size=(2, 8, 4, 4, c_fast)).astype(np.float32)
    w = rng.normal(size=(c_fast * 2, c_fast, k, 1, 1)).astype(np.float32) * 0.2
    bn = _bn_params(c_fast * 2, rng)

    variables = {
        "params": {
            "conv_f2s": {"kernel": _conv3d_w(w)},
            "bn": {"scale": jnp.asarray(bn["scale"]),
                   "bias": jnp.asarray(bn["bias"])},
        },
        "batch_stats": {
            "bn": {"mean": jnp.asarray(bn["mean"]),
                   "var": jnp.asarray(bn["var"])},
        },
    }
    slow_out, fast_out = FuseFastToSlow(cfg=cfg, dim_in=c_fast).apply(
        variables, jnp.asarray(x_slow), jnp.asarray(x_fast), train=False)

    ft = _to_torch(x_fast)
    fuse = F.conv3d(ft, torch.from_numpy(w), stride=(alpha, 1, 1),
                    padding=(k // 2, 0, 0))
    fuse = torch.relu(_torch_bn(c_fast * 2, bn)(fuse))
    expect = np.concatenate([x_slow, _from_torch(fuse)], axis=-1)
    np.testing.assert_allclose(np.asarray(slow_out), expect,
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(fast_out), x_fast, atol=0)


def test_nonlocal_matches_torch():
    """Embedded-gaussian non-local block incl. the dim^-0.5 attention scale
    (reference non_local.py:12-75), eval mode with zero-init output BN
    replaced by random running stats."""
    from dist_tpu.models.backbones.resnet3d import NonLocal

    rng = np.random.default_rng(3)
    c, inner = 8, 4
    x = rng.normal(size=(2, 2, 3, 3, c)).astype(np.float32)
    ws = {n: rng.normal(size=(inner, c, 1, 1, 1)).astype(np.float32) * 0.3
          for n in ("theta", "phi", "g")}
    bs = {n: rng.normal(size=(inner,)).astype(np.float32) * 0.1
          for n in ("theta", "phi", "g")}
    w_out = rng.normal(size=(c, inner, 1, 1, 1)).astype(np.float32) * 0.3
    b_out = rng.normal(size=(c,)).astype(np.float32) * 0.1
    bn = _bn_params(c, rng)

    variables = {
        "params": {
            **{n: {"kernel": _conv3d_w(ws[n]), "bias": jnp.asarray(bs[n])}
               for n in ("theta", "phi", "g")},
            "out": {"kernel": _conv3d_w(w_out), "bias": jnp.asarray(b_out)},
            "bn": {"scale": jnp.asarray(bn["scale"]),
                   "bias": jnp.asarray(bn["bias"])},
        },
        "batch_stats": {"bn": {"mean": jnp.asarray(bn["mean"]),
                               "var": jnp.asarray(bn["var"])}},
    }
    out = NonLocal(None).apply(variables, jnp.asarray(x), train=False)

    xt = _to_torch(x)
    q = F.conv3d(xt, torch.from_numpy(ws["theta"]),
                 torch.from_numpy(bs["theta"])).reshape(2, inner, -1)
    k = F.conv3d(xt, torch.from_numpy(ws["phi"]),
                 torch.from_numpy(bs["phi"])).reshape(2, inner, -1)
    v = F.conv3d(xt, torch.from_numpy(ws["g"]),
                 torch.from_numpy(bs["g"])).reshape(2, inner, -1)
    attn = torch.einsum("nct,ncp->ntp", q, k) * (inner ** -0.5)
    attn = F.softmax(attn, dim=2)
    o = torch.einsum("ntg,ncg->nct", attn, v).reshape(2, inner, 2, 3, 3)
    o = F.conv3d(o, torch.from_numpy(w_out), torch.from_numpy(b_out))
    o = _torch_bn(c, bn)(o)
    expect = _from_torch(_to_torch(x) + o)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4, rtol=1e-4)


def test_route_func_mlp_matches_torch():
    """TAda calibration generator: frame GAP + global context conv, two
    temporal 1D convs, output 1 + residual (reference tada_branch.py:15-63)."""
    from dist_tpu.models.branches.tada import RouteFuncMLP

    rng = np.random.default_rng(4)
    c, ratio, k = 8, 2, (3, 3)
    x = rng.normal(size=(2, 4, 5, 5, c)).astype(np.float32)
    w_g = rng.normal(size=(c, c, 1, 1, 1)).astype(np.float32) * 0.3
    b_g = rng.normal(size=(c,)).astype(np.float32) * 0.1
    w_a = rng.normal(size=(c // ratio, c, k[0], 1, 1)).astype(np.float32) * 0.3
    b_a = rng.normal(size=(c // ratio,)).astype(np.float32) * 0.1
    w_b = rng.normal(size=(c, c // ratio, k[1], 1, 1)).astype(np.float32) * 0.3
    bn = _bn_params(c // ratio, rng)

    variables = {
        "params": {
            "g": {"kernel": _conv3d_w(w_g), "bias": jnp.asarray(b_g)},
            "a": {"kernel": _conv3d_w(w_a), "bias": jnp.asarray(b_a)},
            "bn": {"scale": jnp.asarray(bn["scale"]),
                   "bias": jnp.asarray(bn["bias"])},
            "b": {"kernel": _conv3d_w(w_b)},
        },
        "batch_stats": {"bn": {"mean": jnp.asarray(bn["mean"]),
                               "var": jnp.asarray(bn["var"])}},
    }
    out = RouteFuncMLP(c_in=c, ratio=ratio, kernels=k).apply(
        variables, jnp.asarray(x), train=False)

    xt = _to_torch(x)
    g = xt.mean(dim=(2, 3, 4), keepdim=True)
    frame = xt.mean(dim=(3, 4), keepdim=True)
    g = F.conv3d(g, torch.from_numpy(w_g), torch.from_numpy(b_g))
    h = F.conv3d(frame + g, torch.from_numpy(w_a), torch.from_numpy(b_a),
                 padding=(k[0] // 2, 0, 0))
    h = torch.relu(_torch_bn(c // ratio, bn)(h))
    h = F.conv3d(h, torch.from_numpy(w_b), padding=(k[1] // 2, 0, 0)) + 1.0
    np.testing.assert_allclose(np.asarray(out), _from_torch(h),
                               atol=2e-4, rtol=1e-4)
