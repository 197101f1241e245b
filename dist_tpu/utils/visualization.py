"""Feature-map visualization (reference models/base/base_blocks.py:36-61).

The reference registers forward hooks on every block when
``cfg.VISUALIZATION.ENABLE`` + ``cfg.VISUALIZATION.FEATURE_MAPS.ENABLE``
and writes one channel-normalized tile image per sample per module under
``FEATURE_MAPS.BASE_OUTPUT_DIR/VISUALIZATION.NAME/im_<i>/``. Here the
functional analog (``VideoModel.apply_with_intermediates``) captures every
submodule output in one forward; this module renders + writes the same
artifacts. Consumed by the test task (first batch) and by
``tools/visualize_features.py``.
"""

import os

import numpy as np

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def visualization_enabled(cfg):
    v = cfg.get("VISUALIZATION")
    return bool(v and v.ENABLE and v.FEATURE_MAPS.ENABLE)


def feature_map_image(x):
    """(B, T, H, W, C) feature map -> per-sample (C*H, T*W) uint8 image.

    Mirrors the reference's rendering math (base_blocks.py:45-48): values
    normalized across the CHANNEL axis at each (t, h, w) location, then
    tiled with channels down the rows and frames across the columns."""
    x = np.asarray(x, np.float32)
    xmin = x.min(axis=-1, keepdims=True)
    xmax = x.max(axis=-1, keepdims=True)
    x = (x - xmin) / np.maximum(xmax - xmin, 1e-8)
    b, t, h, w, c = x.shape
    img = x.transpose(0, 4, 2, 1, 3).reshape(b, c * h, t * w)
    return (img * 255.0).astype(np.uint8)


def _iter_feature_maps(tree, path=()):
    """Yield (dotted_path, array) for every 5-D captured intermediate."""
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _iter_feature_maps(v, path + (str(k),))
        return
    if isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            suffix = () if len(tree) == 1 else (str(i),)
            yield from _iter_feature_maps(v, path + suffix)
        return
    if hasattr(tree, "ndim") and tree.ndim == 5:
        name = ".".join(p for p in path if p != "__call__") or "output"
        yield name, tree


def dump_feature_maps(cfg, intermediates, base_index=0):
    """Write the per-module feature images for one batch; returns the
    number of files written. Layout matches the reference
    (base_blocks.py:55-58): ``<out>/<NAME>/im_<sample>/<module>_feature.jpg``."""
    import cv2

    out_root = os.path.join(
        cfg.VISUALIZATION.FEATURE_MAPS.BASE_OUTPUT_DIR or cfg.OUTPUT_DIR,
        cfg.VISUALIZATION.NAME or "features")
    written = 0
    for name, arr in _iter_feature_maps(intermediates):
        imgs = feature_map_image(arr)
        for i in range(imgs.shape[0]):
            d = os.path.join(out_root, f"im_{base_index + i}")
            os.makedirs(d, exist_ok=True)
            safe = name.replace("/", "_")
            cv2.imwrite(os.path.join(d, f"{safe}_feature.jpg"), imgs[i])
            written += 1
    logger.info("Wrote %d feature maps under %s", written, out_root)
    return written


def maybe_dump_first_batch(cfg, model, variables, batch):
    """The test-task hook: when cfg.VISUALIZATION.* is on, capture and dump
    the feature maps of one forward on the given (host) batch.

    Master-process only on multihost: every host holds a DIFFERENT index
    shard, and the dump paths (im_<i>/...) are per-batch-position — letting
    all hosts write the same files on the shared OUTPUT_DIR would race and
    mix videos."""
    if not visualization_enabled(cfg):
        return 0
    import jax
    import jax.numpy as jnp

    from dist_tpu.parallel.collectives import is_master_proc

    if not is_master_proc():
        return 0

    from dist_tpu.data.transforms import normalize_device

    batch = dict(batch)
    if batch.get("text_features") is not None:
        # the un-jitted capture forward runs outside the mesh: a
        # mesh-committed replicated array must come back to host first
        batch["text_features"] = jnp.asarray(
            jax.device_get(batch["text_features"]))
    video = jnp.asarray(batch["video"])
    if video.dtype == jnp.uint8:
        video = normalize_device(video, list(cfg.DATA.MEAN),
                                 list(cfg.DATA.STD))
    inputs = {"video": video,
              "text_features": batch.get("text_features")}
    _, intermediates = model.apply_with_intermediates(variables, inputs,
                                                      train=False)
    return dump_feature_maps(cfg, jax.device_get(intermediates))
