"""Functional torch golden implementations for numerical parity tests.

These compute CLIP/DiST math with ``torch.nn.functional`` public ops on raw
state-dict tensors (no nn.Module graph), giving bit-for-bit the same numbers
torch's module stack produces. Our JAX model + converter must match these.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F


def qg(x):
    return x * torch.sigmoid(1.702 * x)


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


def mha(q, kv, sd, p, heads):
    """nn.MultiheadAttention forward on (L, N, E) via the functional API."""
    out, _ = F.multi_head_attention_forward(
        q, kv, kv, q.shape[-1], heads,
        t(sd[f"{p}.attn.in_proj_weight"]), t(sd[f"{p}.attn.in_proj_bias"]),
        None, None, False, 0.0,
        t(sd[f"{p}.attn.out_proj.weight"]), t(sd[f"{p}.attn.out_proj.bias"]),
        need_weights=False,
    )
    return out


def ln(x, sd, p):
    return F.layer_norm(x, (x.shape[-1],), t(sd[f"{p}.weight"]), t(sd[f"{p}.bias"]))


def mlp(x, sd, p):
    x = F.linear(x, t(sd[f"{p}.c_fc.weight"]), t(sd[f"{p}.c_fc.bias"]))
    x = qg(x)
    return F.linear(x, t(sd[f"{p}.c_proj.weight"]), t(sd[f"{p}.c_proj.bias"]))


def resblock(x, sd, p, heads, attn_mask=None):
    """CLIP residual attention block on (L, N, E)."""
    h = ln(x, sd, f"{p}.ln_1")
    if attn_mask is not None:
        out, _ = F.multi_head_attention_forward(
            h, h, h, x.shape[-1], heads,
            t(sd[f"{p}.attn.in_proj_weight"]), t(sd[f"{p}.attn.in_proj_bias"]),
            None, None, False, 0.0,
            t(sd[f"{p}.attn.out_proj.weight"]), t(sd[f"{p}.attn.out_proj.bias"]),
            need_weights=False, attn_mask=attn_mask,
        )
    else:
        out = mha(h, h, sd, p, heads)
    x = x + out
    x = x + mlp(ln(x, sd, f"{p}.ln_2"), sd, f"{p}.mlp")
    return x


def visual_tower(frames_bchw, sd, arch, num_frames, alpha):
    """CLIP ViT over (B*T, 3, H, W); returns (cls_x, x_logits, taps LND)."""
    x = F.conv2d(frames_bchw, t(sd["visual.conv1.weight"]), None,
                 stride=arch.vision_patch_size)
    x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
    cls = t(sd["visual.class_embedding"]).reshape(1, 1, -1).expand(x.shape[0], 1, -1)
    x = torch.cat([cls, x], dim=1)
    x = x + t(sd["visual.positional_embedding"])
    x = ln(x, sd, "visual.ln_pre")
    x = x.permute(1, 0, 2)  # LND
    if alpha > 1:
        l, bt, c = x.shape
        b = bt // num_frames
        x = x.view(l, b, num_frames, c)[:, :, ::alpha, :].flatten(1, 2)
    taps = []
    for i in range(arch.vision_layers):
        x = resblock(x, sd, f"visual.transformer.resblocks.{i}", arch.vision_heads)
        taps.append(x.clone())
    x = x.permute(1, 0, 2)
    x_logits = ln(x[:, 0, :], sd, "visual.ln_post")
    cls_x = x_logits @ t(sd["visual.proj"])
    return cls_x, x_logits, taps


def text_tower(tokens, sd, arch):
    x = F.embedding(tokens, t(sd["token_embedding.weight"]))
    x = x + t(sd["positional_embedding"])
    x = x.permute(1, 0, 2)
    L = tokens.shape[1]
    mask = torch.full((L, L), float("-inf")).triu_(1)
    for i in range(arch.transformer_layers):
        x = resblock(x, sd, f"transformer.resblocks.{i}",
                     arch.transformer_heads, attn_mask=mask)
    x = x.permute(1, 0, 2)
    eot = tokens.argmax(dim=-1)
    x_logits = x[torch.arange(x.shape[0]), eot]
    return ln(x_logits, sd, "ln_final") @ t(sd["text_projection"])


# ---------------- DiST golden ----------------


def dist_temporal_net(x, sd, p, k):
    """x (B, C, T, H, W)."""
    h = ln(x.permute(0, 2, 3, 4, 1), sd, f"{p}.ln").permute(0, 4, 1, 2, 3)
    h = F.conv3d(h, t(sd[f"{p}.temporal_net.c_fc1.weight"]),
                 t(sd[f"{p}.temporal_net.c_fc1.bias"]), padding=(k // 2, 0, 0))
    h = qg(h)
    h = F.conv3d(h, t(sd[f"{p}.temporal_net.c_fc2.weight"]),
                 t(sd[f"{p}.temporal_net.c_fc2.bias"]), padding=(0, 1, 1))
    return qg(x + h)


def dist_integration_net(x, sd, p, k, num_frames, alpha):
    """x (L, B*t, C)."""
    l, bt, c = x.shape
    tt = num_frames // alpha
    b = bt // tt
    tx = ln(x, sd, f"{p}.ln_temporal").view(l, b, tt, c).permute(1, 3, 2, 0).reshape(b, c, tt, l, 1)
    tx = F.conv3d(tx, t(sd[f"{p}.temporal_ffn.c_fc1.weight"]),
                  t(sd[f"{p}.temporal_ffn.c_fc1.bias"]))
    tx = F.conv3d(tx, t(sd[f"{p}.temporal_ffn.c_fc2.weight"]),
                  t(sd[f"{p}.temporal_ffn.c_fc2.bias"]), padding=(k // 2, 0, 0))
    tx = qg(tx)
    tx = F.conv3d(tx, t(sd[f"{p}.temporal_ffn.c_proj.weight"]),
                  t(sd[f"{p}.temporal_ffn.c_proj.bias"]))
    tx = tx.flatten(3).permute(3, 0, 2, 1).flatten(1, 2)
    ffn = mlp(ln(x, sd, f"{p}.ln"), sd, f"{p}.ffn")
    return ffn + tx


def dist_t2i(x, sd, p, alpha):
    """x (B, C, T, H, W) -> (1+HW, B*t, C')."""
    x = F.conv3d(x, t(sd[f"{p}.linear_fuse.weight"]), t(sd[f"{p}.linear_fuse.bias"]),
                 stride=(alpha, 1, 1))
    x = x.flatten(3)
    b, c, tt, hw = x.shape
    x = x.permute(3, 0, 2, 1)
    cls = t(sd[f"{p}.cls_token"]).expand(1, b, tt, c)
    x = torch.cat([cls, x], dim=0)
    return x.flatten(1, 2)


def dist_i2t(x, sd, p, num_frames, alpha):
    """x (L, B*t, C) -> (B, C', T, H, W)."""
    h = F.linear(x[1:], t(sd[f"{p}.linear_fuse.weight"]), t(sd[f"{p}.linear_fuse.bias"]))
    l, bt, c = h.shape
    tt = num_frames // alpha
    b = bt // tt
    g = int(math.isqrt(l))
    h = h.view(l, b, tt, c).permute(1, 3, 2, 0).reshape(b, c, tt, g, g)
    return F.interpolate(h, size=(tt * alpha, g, g), mode="nearest")


def dist_adapool(prev_feat, top_cls, spat_cls, sd, p, heads, num_frames, alpha):
    """All in LND: prev_feat (L, B*t, C); top_cls (1, B, C); spat_cls (1, B*t, C)."""
    l, bt, c = prev_feat.shape
    tt = num_frames // alpha
    b = bt // tt

    q = ln(spat_cls, sd, f"{p}.spatial_transformer.ln_1")
    kv = ln(prev_feat, sd, f"{p}.spatial_transformer.ln_1")
    agg_sp = mha(q, kv, sd, f"{p}.spatial_transformer", heads)
    spat_cls = spat_cls + agg_sp
    spat_cls = spat_cls + mlp(ln(spat_cls, sd, f"{p}.ln_out_spat_cls_token"),
                              sd, f"{p}.output_map_spatial_cls_token")
    cls_tok = spat_cls[0].reshape(b, tt, c)
    cls_tok = (cls_tok + t(sd[f"{p}.positional_embedding"])).permute(1, 0, 2)
    q = ln(top_cls, sd, f"{p}.temporal_transformer.ln_1")
    kv = ln(cls_tok, sd, f"{p}.temporal_transformer.ln_1")
    agg = mha(q, kv, sd, f"{p}.temporal_transformer", heads)
    top_cls = top_cls + agg
    top_cls = top_cls + mlp(ln(top_cls, sd, f"{p}.ln_out_temp_cls_token"),
                            sd, f"{p}.output_map_cls_token")
    return top_cls, spat_cls


def dist_network(video_bcthw, taps, sd, dist_cfg, d_model):
    """Full DiST side network golden. taps: list over selected layers of
    (L, B*t, d_model). Returns (B, embed_dim)."""
    nf, alpha = dist_cfg.num_frames, dist_cfg.alpha
    tt = nf // alpha
    k = dist_cfg.temporal_kernel_size
    c = dist_cfg.integration_dim
    heads = c // 64

    x_temporal = F.conv3d(video_bcthw, t(sd["dist_net.temporal_stem.weight"]),
                          t(sd["dist_net.temporal_stem.bias"]),
                          stride=(1, dist_cfg.s_patch_size, dist_cfg.s_patch_size),
                          padding=(dist_cfg.t_patch_size // 2, 0, 0))
    res_feat = 0.0
    for idx in range(len(dist_cfg.selected_layers)):
        x_temporal = dist_temporal_net(x_temporal, sd, f"dist_net.temporal_nets.{idx}", k)
        mid = F.linear(taps[idx], t(sd[f"dist_net.input_linears.{idx}.weight"]),
                       t(sd[f"dist_net.input_linears.{idx}.bias"])) + res_feat
        upd_temporal = dist_i2t(mid, sd, f"dist_net.integration2temporal_nets.{idx}",
                                nf, alpha) + x_temporal
        upd_mid = mid + dist_t2i(x_temporal, sd,
                                 f"dist_net.temporal2integration_nets.{idx}", alpha)
        res_feat = dist_integration_net(upd_mid, sd, f"dist_net.integration_nets.{idx}",
                                        k, nf, alpha)
        x_temporal = upd_temporal

    l, bt, _ = upd_mid.shape
    b = bt // tt
    cur = res_feat + upd_mid
    top_cls = t(sd["dist_net.aggregated_cls_token"]).expand(1, b, c).clone()
    spat_cls = t(sd["dist_net.aggregated_spatial_cls_token"]).expand(1, bt, c).clone()
    for i in range(dist_cfg.ada_pooling_layers):
        top_cls, spat_cls = dist_adapool(cur, top_cls, spat_cls, sd,
                                         f"dist_net.adapooling_nets.{i}",
                                         heads, nf, alpha)
    top_cls = top_cls.permute(1, 0, 2)
    last_cls_mean = taps[-1][:1].view(b, tt, d_model).mean(dim=1)
    proj_sp = F.linear(last_cls_mean, t(sd["dist_net.proj_spatial_cls_token.weight"]),
                       t(sd["dist_net.proj_spatial_cls_token.bias"]))
    x_logits = ln(top_cls[:, 0, :] + proj_sp, sd, "dist_net.ln_post")
    return x_logits @ t(sd["dist_net.proj"])
