"""Mixed-precision helpers for the conv / video-transformer backbones.

The reference converts model weights to fp16 with fp32 norm islands
(``convert_weights``, models/base/clip.py:540-561); the CLIP path here
already honors ``TRAIN.MIXED_PRECISION`` via a bf16 compute dtype
(clip/clip_video.py). These helpers extend the same semantics to the rest
of the zoo with one rule: **the activation dtype carries the policy**.
The meta-arch casts its input to bf16 once (``maybe_bf16_input``); every
layer derives its compute dtype from its input (``compute_dtype`` — flax
casts the fp32 master params per-op), and BatchNorm/LayerNorm run as fp32
islands (``fp32_island``). No loss scaling is needed on TPU (bf16 keeps
fp32's exponent range).
"""

import jax.numpy as jnp


def mixed_precision_enabled(cfg):
    return bool(cfg.TRAIN.get("MIXED_PRECISION", False)
                or cfg.TRAIN.get("HALF_PRECISION", False))


def maybe_bf16_input(cfg, x):
    """Cast a backbone input to bf16 when mixed precision is on."""
    if mixed_precision_enabled(cfg) and x.dtype in (jnp.float32,
                                                    jnp.bfloat16):
        return x.astype(jnp.bfloat16)
    return x


def compute_dtype(x):
    """Per-layer compute dtype from the activation dtype: bf16 in -> bf16
    compute; anything else -> flax default (promotes with fp32 params)."""
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else None


def fp32_island(norm_module, x):
    """Apply a norm layer in fp32, returning to the incoming dtype
    (the reference's fp32-LayerNorm-under-fp16, clip.py:181-187)."""
    dt = compute_dtype(x)
    y = norm_module(x.astype(jnp.float32) if dt is not None else x)
    return y.astype(dt) if dt is not None else y
