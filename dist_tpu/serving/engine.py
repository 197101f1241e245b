"""Inference engine: one config -> one compiled, fixed-shape predictor.

TPU serving rules encoded here:

- **Static shapes, one compile.** The engine always runs the jitted eval
  step at a fixed ``batch_size`` (requests are padded up); XLA compiles
  exactly once, at :meth:`warmup`, never in the request path.
- **uint8 on the wire.** Clips cross host->device as uint8 (4x less PCIe
  than fp32); normalization happens inside the jit
  (``tasks/state.py::_prep_video``).
- **Async dispatch.** ``predict`` enqueues the device computation and only
  blocks on the result readback, so consecutive batches overlap host work
  with device execution.

Checkpoint resolution and the label-text classifier setup follow the test
task (reference ``runs/test.py:181-250``); with no checkpoint configured
the engine serves the randomly-initialized model (useful for load tests
and smoke tests only).
"""

import numpy as np

import jax

from dist_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class InferenceEngine:
    """Build once, then ``predict(clips) -> scores`` forever.

    clips: uint8 ``(n, T, S, S, 3)`` with ``n <= batch_size``,
    ``T = DATA.NUM_INPUT_FRAMES``, ``S = DATA.TEST_CROP_SIZE``.
    Returns per-clip class scores ``(n, num_classes)`` (softmax if the
    head's eval activation is softmax, like the test task).
    """

    def __init__(self, cfg, batch_size=8):
        from dist_tpu.models.base.models import build_model
        from dist_tpu.parallel.mesh import build_mesh
        from dist_tpu.tasks.state import make_eval_step
        from dist_tpu.tasks.test import _init_test_state
        from dist_tpu.utils import checkpoint as cu

        assert not isinstance(cfg.VIDEO.HEAD.NUM_CLASSES, (list, tuple)), (
            "the serving engine exposes single-label heads; EPIC dual-head "
            "models serve through the submission task")
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.num_frames = int(cfg.DATA.NUM_INPUT_FRAMES)
        self.crop = int(cfg.DATA.TEST_CROP_SIZE or 224)
        self.num_classes = int(cfg.VIDEO.HEAD.NUM_CLASSES)

        self.model = build_model(cfg)
        self.mesh = build_mesh(cfg)
        state = _init_test_state(cfg, self.model, {"video": np.zeros(
            (1, self.num_frames, self.crop, self.crop, 3), np.float32)})
        self.state = cu.load_test_checkpoint(cfg, state)
        with self.mesh:
            # commit the weights to the mesh ONCE (as tasks/test.py does):
            # without this, every predict re-places the full state from the
            # default device (per-request GBs on multi-chip meshes)
            from dist_tpu.parallel.mesh import shard_params
            self.state = shard_params(self.mesh, self.state,
                                      fsdp=bool(cfg.TPU.get("FSDP", False)))
        self.label_names, self.text_features = self._label_setup()
        eval_step = make_eval_step(self.model, cfg)
        # return ONLY preds from the jit: the step's top-k metrics over the
        # dummy labels are then dead-code-eliminated instead of computed
        # per request
        self._step = jax.jit(lambda s, b: eval_step(s, b)["preds"])
        self._compiled = False

    def _label_setup(self):
        """Label names + cached text features, exactly as the test task
        builds them (prompted label texts -> frozen text tower, once)."""
        from dist_tpu.data.base_dataset import resolve_label_texts

        names, tokens = resolve_label_texts(self.cfg, self.num_classes)
        if tokens is None:
            return names, None
        from dist_tpu.tasks.state import compute_text_features
        return names, compute_text_features(
            self.model, self.state.variables, tokens, mesh=self.mesh)

    def _buckets(self):
        """Compiled batch shapes: powers of two up to ``batch_size`` (plus
        ``batch_size`` itself). A request batch runs at the smallest
        bucket >= n instead of always padding to the max — at low
        occupancy (batch-1 requests against batch_size 8) that is up to
        8x less device work per request. Each bucket is one extra cached
        compile, paid at warmup."""
        b, bs = 1, []
        while b < self.batch_size:
            bs.append(b)
            b *= 2
        bs.append(self.batch_size)
        return bs

    def warmup(self):
        """Compile the step at every serving bucket (do this BEFORE
        accepting traffic: first-compile is seconds-to-minutes on TPU)."""
        for b in self._buckets():
            dummy = np.zeros(
                (b, self.num_frames, self.crop, self.crop, 3), np.uint8)
            self.predict(dummy)
        self._compiled = True
        logger.info("serving warmup done: buckets=%s frames=%d crop=%d "
                    "classes=%d", self._buckets(), self.num_frames,
                    self.crop, self.num_classes)

    def predict(self, clips):
        """clips uint8 (n<=B, T, S, S, 3) -> scores (n, num_classes)."""
        from dist_tpu.parallel.mesh import shard_batch

        clips = np.asarray(clips)
        assert clips.ndim == 5 and clips.dtype == np.uint8, (
            f"expected uint8 (n,T,S,S,3), got {clips.dtype} {clips.shape}")
        n = clips.shape[0]
        assert n <= self.batch_size, (n, self.batch_size)
        expect = (self.num_frames, self.crop, self.crop, 3)
        assert clips.shape[1:] == expect, (clips.shape, expect)
        bucket = next(b for b in self._buckets() if b >= n)
        if n < bucket:  # pad to the bucket's compiled static shape
            pad = np.zeros((bucket - n,) + expect, np.uint8)
            clips = np.concatenate([clips, pad], axis=0)

        from dist_tpu.parallel.mesh import DATA_AXIS

        batch = {"video": clips,
                 "labels": np.zeros((bucket,), np.int64)}
        with self.mesh:
            # shard when the batch tiles the DATA axis (shard_batch places
            # P('data'); the total device count is the wrong divisor on
            # pipe/model meshes)
            if bucket % int(self.mesh.shape.get(DATA_AXIS, 1)) == 0:
                batch = shard_batch(self.mesh, batch)
            if self.text_features is not None:
                batch["text_features"] = self.text_features
            preds = self._step(self.state, batch)
            out = np.asarray(jax.device_get(preds))[:n]
        self._compiled = True  # readiness even when warmup() was skipped
        return out

    def topk(self, scores, k=5):
        """[(class_index, label_or_None, score), ...] rows per clip."""
        out = []
        for row in np.asarray(scores):
            idx = np.argsort(row)[::-1][:k]
            out.append([(int(i),
                         self.label_names[int(i)] if self.label_names
                         else None,
                         float(row[int(i)])) for i in idx])
        return out
