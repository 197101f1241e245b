"""Synthetic torch-style CLIP(+DiST) state dicts for converter/parity tests.

Generates random weights with exactly the reference checkpoint's key names
and torch tensor layouts, standing in for the real OpenAI/DiST checkpoints
(which are not available in this environment).
"""

import numpy as np


def make_clip_state_dict(rng, *, embed_dim=32, image_resolution=32,
                         vision_layers=2, vision_width=64, vision_patch_size=16,
                         context_length=12, vocab_size=50, transformer_width=32,
                         transformer_layers=2):
    sd = {}
    r = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)

    grid = image_resolution // vision_patch_size
    sd["visual.conv1.weight"] = r(vision_width, 3, vision_patch_size, vision_patch_size)
    sd["visual.class_embedding"] = r(vision_width)
    sd["visual.positional_embedding"] = r(grid * grid + 1, vision_width)
    sd["visual.proj"] = r(vision_width, embed_dim)
    for p in ("visual.ln_pre", "visual.ln_post"):
        sd[f"{p}.weight"] = np.ones(vision_width, np.float32) + r(vision_width)
        sd[f"{p}.bias"] = r(vision_width)
    for i in range(vision_layers):
        _block(sd, f"visual.transformer.resblocks.{i}", vision_width, r)

    sd["token_embedding.weight"] = r(vocab_size, transformer_width)
    sd["positional_embedding"] = r(context_length, transformer_width)
    sd["text_projection"] = r(transformer_width, embed_dim)
    sd["ln_final.weight"] = np.ones(transformer_width, np.float32) + r(transformer_width)
    sd["ln_final.bias"] = r(transformer_width)
    for i in range(transformer_layers):
        _block(sd, f"transformer.resblocks.{i}", transformer_width, r)
    sd["logit_scale"] = np.float32(np.log(1 / 0.07)).reshape(())
    return sd


def _block(sd, p, d, r):
    sd[f"{p}.ln_1.weight"] = np.ones(d, np.float32) + r(d)
    sd[f"{p}.ln_1.bias"] = r(d)
    sd[f"{p}.ln_2.weight"] = np.ones(d, np.float32) + r(d)
    sd[f"{p}.ln_2.bias"] = r(d)
    sd[f"{p}.attn.in_proj_weight"] = r(3 * d, d)
    sd[f"{p}.attn.in_proj_bias"] = r(3 * d)
    sd[f"{p}.attn.out_proj.weight"] = r(d, d)
    sd[f"{p}.attn.out_proj.bias"] = r(d)
    sd[f"{p}.mlp.c_fc.weight"] = r(4 * d, d)
    sd[f"{p}.mlp.c_fc.bias"] = r(4 * d)
    sd[f"{p}.mlp.c_proj.weight"] = r(d, 4 * d)
    sd[f"{p}.mlp.c_proj.bias"] = r(d)


def _mha_keys(sd, p, d, r):
    sd[f"{p}.ln_1.weight"] = np.ones(d, np.float32) + r(d)
    sd[f"{p}.ln_1.bias"] = r(d)
    sd[f"{p}.attn.in_proj_weight"] = r(3 * d, d)
    sd[f"{p}.attn.in_proj_bias"] = r(3 * d)
    sd[f"{p}.attn.out_proj.weight"] = r(d, d)
    sd[f"{p}.attn.out_proj.bias"] = r(d)


def _mlp_keys(sd, p, d, r, ratio=4):
    sd[f"{p}.c_fc.weight"] = r(ratio * d, d)
    sd[f"{p}.c_fc.bias"] = r(ratio * d)
    sd[f"{p}.c_proj.weight"] = r(d, ratio * d)
    sd[f"{p}.c_proj.bias"] = r(d)


def add_dist_state_dict(sd, rng, dist_cfg, d_model):
    r = lambda *s: (rng.standard_normal(s) * 0.02).astype(np.float32)
    c = dist_cfg.integration_dim
    ct = dist_cfg.temporal_dim
    k = dist_cfg.temporal_kernel_size
    tt = dist_cfg.num_frames // dist_cfg.alpha
    n = len(dist_cfg.selected_layers)
    h_t = int(ct * dist_cfg.temporal_conv_mlp_ratio)
    h_i = int(c * dist_cfg.integration_mlp_ratio)
    h_it = int(c * dist_cfg.integration_temporal_mlp_ratio)

    sd["dist_net.temporal_stem.weight"] = r(
        ct, 3, dist_cfg.t_patch_size, dist_cfg.s_patch_size, dist_cfg.s_patch_size)
    sd["dist_net.temporal_stem.bias"] = r(ct)
    for i in range(n):
        sd[f"dist_net.input_linears.{i}.weight"] = r(c, d_model)
        sd[f"dist_net.input_linears.{i}.bias"] = r(c)
        p = f"dist_net.temporal_nets.{i}"
        sd[f"{p}.ln.weight"] = np.ones(ct, np.float32) + r(ct)
        sd[f"{p}.ln.bias"] = r(ct)
        sd[f"{p}.temporal_net.c_fc1.weight"] = r(h_t, ct, k, 1, 1)
        sd[f"{p}.temporal_net.c_fc1.bias"] = r(h_t)
        sd[f"{p}.temporal_net.c_fc2.weight"] = r(ct, h_t, 1, 3, 3)
        sd[f"{p}.temporal_net.c_fc2.bias"] = r(ct)
        p = f"dist_net.integration2temporal_nets.{i}"
        sd[f"{p}.linear_fuse.weight"] = r(ct, c)
        sd[f"{p}.linear_fuse.bias"] = r(ct)
        p = f"dist_net.temporal2integration_nets.{i}"
        sd[f"{p}.linear_fuse.weight"] = r(c, ct, dist_cfg.alpha, 1, 1)
        sd[f"{p}.linear_fuse.bias"] = r(c)
        sd[f"{p}.cls_token"] = r(1, 1, tt, c)
        p = f"dist_net.integration_nets.{i}"
        sd[f"{p}.ln.weight"] = np.ones(c, np.float32) + r(c)
        sd[f"{p}.ln.bias"] = r(c)
        sd[f"{p}.ln_temporal.weight"] = np.ones(c, np.float32) + r(c)
        sd[f"{p}.ln_temporal.bias"] = r(c)
        _mlp_keys(sd, f"{p}.ffn", c, r, ratio=int(dist_cfg.integration_mlp_ratio))
        sd[f"{p}.temporal_ffn.c_fc1.weight"] = r(h_it, c, 1, 1, 1)
        sd[f"{p}.temporal_ffn.c_fc1.bias"] = r(h_it)
        sd[f"{p}.temporal_ffn.c_fc2.weight"] = r(h_it, h_it, k, 1, 1)
        sd[f"{p}.temporal_ffn.c_fc2.bias"] = r(h_it)
        sd[f"{p}.temporal_ffn.c_proj.weight"] = r(c, h_it, 1, 1, 1)
        sd[f"{p}.temporal_ffn.c_proj.bias"] = r(c)

    for i in range(dist_cfg.ada_pooling_layers):
        p = f"dist_net.adapooling_nets.{i}"
        _mha_keys(sd, f"{p}.temporal_transformer", c, r)
        _mha_keys(sd, f"{p}.spatial_transformer", c, r)
        sd[f"{p}.positional_embedding"] = r(1, tt, c)
        _mlp_keys(sd, f"{p}.output_map_cls_token", c, r)
        _mlp_keys(sd, f"{p}.output_map_spatial_cls_token", c, r)
        sd[f"{p}.ln_out_temp_cls_token.weight"] = np.ones(c, np.float32) + r(c)
        sd[f"{p}.ln_out_temp_cls_token.bias"] = r(c)
        sd[f"{p}.ln_out_spat_cls_token.weight"] = np.ones(c, np.float32) + r(c)
        sd[f"{p}.ln_out_spat_cls_token.bias"] = r(c)

    sd["dist_net.proj_spatial_cls_token.weight"] = r(c, d_model)
    sd["dist_net.proj_spatial_cls_token.bias"] = r(c)
    sd["dist_net.ln_post.weight"] = np.ones(c, np.float32) + r(c)
    sd["dist_net.ln_post.bias"] = r(c)
    emb = sd["text_projection"].shape[1]
    sd["dist_net.proj"] = r(c, emb)
    sd["dist_net.aggregated_cls_token"] = r(1, 1, c)
    sd["dist_net.aggregated_spatial_cls_token"] = r(1, 1, c)
    return sd
