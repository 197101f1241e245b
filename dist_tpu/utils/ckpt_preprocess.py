"""Cross-architecture checkpoint adaptation
(reference utils/checkpoint.py:146-274).

Operates on our flax param pytrees (numpy leaves):

- :func:`inflate_2d_to_3d` — I3D-style 2D->3D conv inflation: repeat the
  kernel over the new temporal axis and divide by its length
  (checkpoint.py:146-182); our conv layouts are (H,W,I,O) -> (D,H,W,I,O),
- :func:`preprocess_params` — positional-embedding repeat /
  super-resolution (+ temporal interpolation) and tubelet central-frame /
  average patch-embed init (checkpoint.py:184-274), applied by flax param
  path instead of torch key strings.
"""

import math

import numpy as np

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def inflate_2d_to_3d(params_2d, params_3d_template):
    """Structurally merge 2D weights into a 3D template, inflating 4-D conv
    kernels (H,W,I,O) to 5-D (D,H,W,I,O) by temporal repeat / D."""
    def walk(src, tpl, path):
        if isinstance(tpl, dict):
            return {k: walk(src.get(k), tpl[k], path + (k,)) if isinstance(src, dict) else tpl[k]
                    for k in tpl}
        if src is None:
            return tpl
        src = np.asarray(src)
        tpl_shape = np.shape(tpl)
        if src.ndim == 4 and len(tpl_shape) == 5:
            assert src.shape[:2] == tuple(tpl_shape[1:3]), (
                f"{'/'.join(path)}: spatial dims mismatch {src.shape} {tpl_shape}")
            d = tpl_shape[0]
            logger.info("Inflate %s: %s -> %s", "/".join(path), src.shape, tpl_shape)
            return np.repeat(src[None], d, axis=0) / d
        if src.shape == tuple(tpl_shape):
            return src
        logger.info("Unexpected %s: %s -|> %s", "/".join(path), src.shape, tpl_shape)
        return tpl
    return walk(params_2d, params_3d_template, ())


def _bilinear_resize_grid(pos, side_new):
    """(N, C) spatial pos-embed grid -> resized (side_new^2, C)."""
    import cv2
    n, c = pos.shape
    side = int(math.isqrt(n))
    grid = pos.reshape(side, side, c).astype(np.float32)
    out = cv2.resize(grid, (side_new, side_new), interpolation=cv2.INTER_LINEAR)
    return out.reshape(side_new * side_new, c)


def preprocess_params(cfg, params):
    """Apply CHECKPOINT_PRE_PROCESS to a backbone param tree (the flax tree
    for Transformer/FactorizedTransformer backbones: keys ``pos_embd``,
    ``temp_embd``, ``stem/conv1/kernel``)."""
    pp = cfg.TRAIN.CHECKPOINT_PRE_PROCESS
    params = dict(params)

    pos_mode = pp.get("POS_EMBED") or None
    if pos_mode == "repeat" and "pos_embd" in params:
        pe = np.asarray(params["pos_embd"])  # (1, N+1, C)
        _, n, c = pe.shape
        f = cfg.DATA.NUM_INPUT_FRAMES
        ts = cfg.VIDEO.BACKBONE.get("TUBELET_SIZE")
        if ts:
            f = f // ts
        cls = pe[:, :1]
        body = np.tile(pe[:, 1:][:, None], (1, f, 1, 1)).reshape(1, f * (n - 1), c)
        params["pos_embd"] = np.concatenate([cls, body], axis=1)
        logger.info("Repeated positional embedding x%d.", f)
    elif pos_mode == "super-resolution" and "pos_embd" in params:
        pe = np.asarray(params["pos_embd"])
        _, n, c = pe.shape
        side_new = cfg.DATA.TRAIN_CROP_SIZE // cfg.VIDEO.BACKBONE.PATCH_SIZE
        side_old = int(math.isqrt(n - 1))
        if side_new != side_old:
            body = _bilinear_resize_grid(pe[0, 1:], side_new)
            params["pos_embd"] = np.concatenate(
                [pe[:, :1], body[None]], axis=1)
            logger.info("Pos-embed super-resolution %d -> %d.", side_old, side_new)
        if "temp_embd" in params:
            te = np.asarray(params["temp_embd"])  # (1, T+1, C)
            t_new = cfg.DATA.NUM_INPUT_FRAMES // cfg.VIDEO.BACKBONE.TUBELET_SIZE
            t_old = te.shape[1] - 1
            if t_new != t_old:
                body = te[0, 1:]
                xs = np.linspace(0, t_old - 1, t_new)
                lo = np.floor(xs).astype(int)
                hi = np.minimum(lo + 1, t_old - 1)
                w = (xs - lo)[:, None]
                interp = body[lo] * (1 - w) + body[hi] * w
                params["temp_embd"] = np.concatenate(
                    [te[:, :1], interp[None]], axis=1)
                logger.info("Temp-embed interpolation %d -> %d.", t_old, t_new)

    patch_mode = pp.get("PATCH_EMBED") or pp.get("PATCH_EMBD") or None
    if patch_mode in ("central_frame", "average"):
        stem = params.get("stem", {})
        conv = dict(stem.get("conv1", {}))
        if "kernel" in conv:
            k = np.asarray(conv["kernel"])  # (D,H,W,I,O), D==1 for 2D ckpts
            ts = cfg.VIDEO.BACKBONE.TUBELET_SIZE
            if patch_mode == "central_frame":
                w = np.zeros((ts,) + k.shape[1:], k.dtype)
                w[ts // 2] = k[0]
                logger.info("Central-frame tubelet init (ts=%d).", ts)
            else:
                w = np.repeat(k[:1], ts, axis=0) / float(ts)
                logger.info("Average tubelet init (ts=%d).", ts)
            conv["kernel"] = w
            stem = dict(stem)
            stem["conv1"] = conv
            params["stem"] = stem
    return params
