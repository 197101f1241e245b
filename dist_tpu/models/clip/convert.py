"""PyTorch -> JAX checkpoint conversion for CLIP(+DiST) weights.

Replaces the reference's checkpoint machinery for the CLIP path:

- loading OpenAI jit archives / ``.pyth`` pickles
  (``models/base/clip.py:614-629``),
- the released-checkpoint ``ladder_net.* -> dist_net.*`` rename
  (``process_dist_cpkt.py:10-30``),
- per-layer torch ModuleList weights are **stacked** along a leading layer
  axis to feed the scanned transformer/ladder (the TPU build's layer-scan
  replaces torch's per-layer modules).

Layout rules (torch -> flax):
  Linear  weight (out, in)            -> kernel (in, out)       [transpose]
  Conv2d  weight (out, in, H, W)      -> kernel (H, W, in, out)
  Conv3d  weight (out, in, D, H, W)   -> kernel (D, H, W, in, out)
  LayerNorm weight/bias               -> scale/bias (fp32)
  MultiheadAttention in_proj_weight (3D, D) -> (D, 3D) [transpose]

All converted params are fp32 (fp16 checkpoints are upcast; the compute
dtype is applied at use-time by the modules).
"""

import re
from typing import Dict

import numpy as np

from dist_tpu.models.clip.model import sniff_architecture


def _t(x):
    return np.ascontiguousarray(x.T)


def _conv2d(x):   # (O,I,H,W) -> (H,W,I,O)
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _conv3d(x):   # (O,I,D,H,W) -> (D,H,W,I,O)
    return np.ascontiguousarray(np.transpose(x, (2, 3, 4, 1, 0)))


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (jit archive or pickle) to numpy fp32.

    Handles: OpenAI CLIP ``.pt`` TorchScript archives, ``.pyth`` train
    checkpoints (taking ``model_state``), and plain state-dict pickles;
    applies the ``ladder_net -> dist_net`` rename and strips ``module.``
    prefixes (reference utils/checkpoint.py:326-336, process_dist_cpkt.py).
    """
    import torch

    try:
        sd = torch.jit.load(path, map_location="cpu").state_dict()
    except Exception:
        blob = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(blob, dict) and "model_state" in blob:
            sd = blob["model_state"]
        elif isinstance(blob, dict) and "state_dict" in blob:
            sd = blob["state_dict"]
        else:
            sd = blob
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        k = k.replace("module.", "") if k.startswith("module.") else k
        k = k.replace("ladder_net.", "dist_net.")
        out[k] = v.float().numpy()
    for drop in ("input_resolution", "context_length", "vocab_size"):
        out.pop(drop, None)
    return out


def _stack_layers(sd, prefix, n):
    """Collect {prefix}.{i}.rest -> {rest: stacked (n, ...)}."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.(.+)")
    per_key = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            per_key.setdefault(m.group(2), {})[int(m.group(1))] = v
    out = {}
    for rest, by_idx in per_key.items():
        assert len(by_idx) == n, f"{prefix}.{rest}: {len(by_idx)} != {n} layers"
        out[rest] = np.stack([by_idx[i] for i in range(n)], axis=0)
    return out


def _ln(stacked_or_flat, w_key="weight", b_key="bias"):
    return {"scale": stacked_or_flat[w_key], "bias": stacked_or_flat[b_key]}


def _convert_resblocks(stacked):
    """Stacked per-layer torch block weights -> scanned flax block params."""
    def st(x):  # stacked transpose of the trailing 2 dims
        return np.ascontiguousarray(np.swapaxes(x, -1, -2))

    return {
        "block": {
            "ln_1": {"scale": stacked["ln_1.weight"], "bias": stacked["ln_1.bias"]},
            "ln_2": {"scale": stacked["ln_2.weight"], "bias": stacked["ln_2.bias"]},
            "attn": {
                "in_proj_weight": st(stacked["attn.in_proj_weight"]),
                "in_proj_bias": stacked["attn.in_proj_bias"],
                "out_proj": {
                    "kernel": st(stacked["attn.out_proj.weight"]),
                    "bias": stacked["attn.out_proj.bias"],
                },
            },
            "mlp": {
                "c_fc": {"kernel": st(stacked["mlp.c_fc.weight"]),
                         "bias": stacked["mlp.c_fc.bias"]},
                "c_proj": {"kernel": st(stacked["mlp.c_proj.weight"]),
                           "bias": stacked["mlp.c_proj.bias"]},
            },
        }
    }


def convert_clip_params(sd: Dict[str, np.ndarray], with_dist=None):
    """Full torch CLIP(+DiST) state dict -> flax params pytree.

    ``with_dist``: a DiSTConfig when the checkpoint carries dist_net weights
    to convert (None = skip them).
    """
    arch = sniff_architecture(sd)
    params = {
        "logit_scale": sd["logit_scale"].reshape(()),
        "visual": {
            "class_embedding": sd["visual.class_embedding"],
            "positional_embedding": sd["visual.positional_embedding"],
            "proj": sd["visual.proj"],
            "conv1": {"kernel": _conv2d(sd["visual.conv1.weight"])},
            "ln_pre": {"scale": sd["visual.ln_pre.weight"],
                       "bias": sd["visual.ln_pre.bias"]},
            "ln_post": {"scale": sd["visual.ln_post.weight"],
                        "bias": sd["visual.ln_post.bias"]},
            "resblocks": _convert_resblocks(
                _stack_layers(sd, "visual.transformer.resblocks",
                              arch.vision_layers)),
        },
        "text": {
            "token_embedding": sd["token_embedding.weight"],
            "positional_embedding": sd["positional_embedding"],
            "text_projection": sd["text_projection"],
            "ln_final": {"scale": sd["ln_final.weight"],
                         "bias": sd["ln_final.bias"]},
            "resblocks": _convert_resblocks(
                _stack_layers(sd, "transformer.resblocks",
                              arch.transformer_layers)),
        },
    }
    if with_dist is not None and any(k.startswith("dist_net.") for k in sd):
        params["dist_net"] = convert_dist_net(sd, with_dist)
    return params, arch


def convert_dist_net(sd, dist_cfg):
    """dist_net.* torch weights -> scanned-ladder flax params
    (models/module_zoo/branches/dist.py param inventory)."""
    n = len(dist_cfg.selected_layers)

    def stacked(prefix):
        return _stack_layers(sd, f"dist_net.{prefix}", n)

    in_lin = stacked("input_linears")
    t_nets = stacked("temporal_nets")
    i2t = stacked("integration2temporal_nets")
    t2i = stacked("temporal2integration_nets")
    integ = stacked("integration_nets")

    def st(x):
        return np.ascontiguousarray(np.swapaxes(x, -1, -2))

    def sconv3d(x):  # stacked (N,O,I,D,H,W) -> (N,D,H,W,I,O)
        return np.ascontiguousarray(np.transpose(x, (0, 3, 4, 5, 2, 1)))

    ladder = {
        "temporal_net": {
            "ln": {"scale": t_nets["ln.weight"], "bias": t_nets["ln.bias"]},
            "c_fc1": {"kernel": sconv3d(t_nets["temporal_net.c_fc1.weight"]),
                      "bias": t_nets["temporal_net.c_fc1.bias"]},
            "c_fc2": {"kernel": sconv3d(t_nets["temporal_net.c_fc2.weight"]),
                      "bias": t_nets["temporal_net.c_fc2.bias"]},
        },
        "integration2temporal": {
            "linear_fuse": {"kernel": st(i2t["linear_fuse.weight"]),
                            "bias": i2t["linear_fuse.bias"]},
        },
        "temporal2integration": {
            "linear_fuse": {"kernel": sconv3d(t2i["linear_fuse.weight"]),
                            "bias": t2i["linear_fuse.bias"]},
            # torch (N,1,1,t,C) -> (N,1,t,C)
            "cls_token": t2i["cls_token"].reshape(
                n, 1, t2i["cls_token"].shape[-2], t2i["cls_token"].shape[-1]),
        },
        "integration_net": {
            "ln": {"scale": integ["ln.weight"], "bias": integ["ln.bias"]},
            "ln_temporal": {"scale": integ["ln_temporal.weight"],
                            "bias": integ["ln_temporal.bias"]},
            "ffn": {
                "c_fc": {"kernel": st(integ["ffn.c_fc.weight"]),
                         "bias": integ["ffn.c_fc.bias"]},
                "c_proj": {"kernel": st(integ["ffn.c_proj.weight"]),
                           "bias": integ["ffn.c_proj.bias"]},
            },
            "c_fc1": {"kernel": sconv3d(integ["temporal_ffn.c_fc1.weight"]),
                      "bias": integ["temporal_ffn.c_fc1.bias"]},
            "c_fc2": {"kernel": sconv3d(integ["temporal_ffn.c_fc2.weight"]),
                      "bias": integ["temporal_ffn.c_fc2.bias"]},
            "c_proj": {"kernel": sconv3d(integ["temporal_ffn.c_proj.weight"]),
                       "bias": integ["temporal_ffn.c_proj.bias"]},
        },
    }

    def mha(prefix):
        return {
            "ln_1": {"scale": sd[f"{prefix}.ln_1.weight"],
                     "bias": sd[f"{prefix}.ln_1.bias"]},
            "attn": {
                "in_proj_weight": _t(sd[f"{prefix}.attn.in_proj_weight"]),
                "in_proj_bias": sd[f"{prefix}.attn.in_proj_bias"],
                "out_proj": {"kernel": _t(sd[f"{prefix}.attn.out_proj.weight"]),
                             "bias": sd[f"{prefix}.attn.out_proj.bias"]},
            },
        }

    def mlp(prefix):
        return {
            "c_fc": {"kernel": _t(sd[f"{prefix}.c_fc.weight"]),
                     "bias": sd[f"{prefix}.c_fc.bias"]},
            "c_proj": {"kernel": _t(sd[f"{prefix}.c_proj.weight"]),
                       "bias": sd[f"{prefix}.c_proj.bias"]},
        }

    dist_params = {
        "ladder": ladder,
        # the per-layer tap projections live OUTSIDE the scan as one stacked
        # batched matmul (dist_net.py::StackedInputLinear): kernel (n, d, c)
        "input_linears": {"kernel": st(in_lin["weight"]),
                          "bias": in_lin["bias"]},
        "temporal_stem": {"kernel": _conv3d(sd["dist_net.temporal_stem.weight"]),
                          "bias": sd["dist_net.temporal_stem.bias"]},
        "proj_spatial_cls_token": {
            "kernel": _t(sd["dist_net.proj_spatial_cls_token.weight"]),
            "bias": sd["dist_net.proj_spatial_cls_token.bias"]},
        "ln_post": {"scale": sd["dist_net.ln_post.weight"],
                    "bias": sd["dist_net.ln_post.bias"]},
        "proj": sd["dist_net.proj"],
        "aggregated_cls_token": sd["dist_net.aggregated_cls_token"],
        "aggregated_spatial_cls_token": sd["dist_net.aggregated_spatial_cls_token"],
    }
    for i in range(dist_cfg.ada_pooling_layers):
        p = f"dist_net.adapooling_nets.{i}"
        dist_params[f"adapooling_{i}"] = {
            "temporal_transformer": mha(f"{p}.temporal_transformer"),
            "spatial_transformer": mha(f"{p}.spatial_transformer"),
            "positional_embedding": sd[f"{p}.positional_embedding"],
            "output_map_cls_token": mlp(f"{p}.output_map_cls_token"),
            "output_map_spatial_cls_token": mlp(f"{p}.output_map_spatial_cls_token"),
            "ln_out_temp_cls_token": {
                "scale": sd[f"{p}.ln_out_temp_cls_token.weight"],
                "bias": sd[f"{p}.ln_out_temp_cls_token.bias"]},
            "ln_out_spat_cls_token": {
                "scale": sd[f"{p}.ln_out_spat_cls_token.weight"],
                "bias": sd[f"{p}.ln_out_spat_cls_token.bias"]},
        }
    return dist_params
