"""Loader builder: dataset -> batched, prefetched numpy iterator.

Replaces the reference's torch DataLoader + DistributedSampler stack
(``dataset/base/builder.py:46-123``, ``utils/sampler.py``):

- deterministic per-host index sharding (each JAX process reads its own
  contiguous shard of the shuffled index stream — the input-pipeline analog
  of ``DistributedSampler``),
- the MultiFold semantics (``MultiFoldDistributedSampler``,
  utils/sampler.py:90-180): a "fold epoch" concatenates ``NUM_FOLDS``
  independently shuffled epochs so checkpoint/eval cadence matches
  large-batch schedules,
- a thread-pool decode + bounded prefetch queue (DataLoader workers ->
  threads; video decode releases the GIL inside OpenCV),
- an optional PROCESS pool (``DATA_LOADER.WORKER_TYPE: process``) for
  GIL-bound sample work (numpy-heavy RandAugment/AugMix): the reference's
  worker-process DataLoader equivalent, with the dataset rebuilt once per
  worker process from the pickled cfg.
"""

import queue
import threading
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np

from dist_tpu.data.base_dataset import DATASET_REGISTRY
from dist_tpu.utils import logging
from dist_tpu.utils.registry import Registry

logger = logging.get_logger(__name__)

COLLATE_FN_REGISTRY = Registry("CollateFn")


@COLLATE_FN_REGISTRY.register()
class ZeroShotCollate:
    """Keep one shared text embedding per batch instead of per sample
    (reference dataset/utils/collate_functions.py:13-20)."""

    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, batch):
        if "text_embedding" in batch:
            batch["text_embedding"] = batch["text_embedding"][:1]
        return batch


def build_dataset(cfg, split):
    name = (cfg.TRAIN.DATASET if split in ("train", "val") else cfg.TEST.DATASET)
    if cfg.DATA.get("SYNTHETIC", False):
        name = "synthetic"
    cls = DATASET_REGISTRY.get_strict(str(name).capitalize())
    return cls(cfg, split)


# ---- process-pool workers (DATA_LOADER.WORKER_TYPE: process) ----
# The dataset is rebuilt ONCE per worker process (initializer) from the
# pickled cfg dict — the analog of torch DataLoader worker processes
# (reference dataset/base/builder.py:46-93). Sample access goes through a
# module-level function because bound methods of the parent's dataset
# don't pickle usefully.

_PROC_DATASET = None


def _proc_worker_init(cfg_dict, split):
    global _PROC_DATASET
    try:
        import cv2
        cv2.setNumThreads(0)  # workers are the parallelism; don't nest
    except Exception:
        pass
    from dist_tpu.config.config import Config
    _PROC_DATASET = build_dataset(Config(cfg_dict), split)


def _proc_worker_getitem(index, epoch_rate=None, seed=None):
    if epoch_rate is not None and hasattr(_PROC_DATASET, "set_epoch_rate"):
        # curriculum progress travels with the request (the parent's
        # set_epoch_rate only mutates the parent's dataset copy)
        _PROC_DATASET.set_epoch_rate(epoch_rate)
    return _PROC_DATASET.__getitem__(index, seed)


class Loader:
    """Batched iterator with per-epoch shuffling and threaded prefetch."""

    def __init__(self, dataset, batch_size, shuffle, drop_last, num_workers,
                 seed=0, num_folds=1, process_index=0, process_count=1,
                 prefetch=2, collate_fn=None, worker_type="thread",
                 worker_ctx=None):
        self.collate_fn = collate_fn
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, int(num_workers))
        self.seed = seed
        self.num_folds = num_folds
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.epoch = 0
        self.skip_batches = 0
        assert worker_type in ("thread", "process"), worker_type
        import inspect
        try:  # duck-typed datasets (tests, user-supplied) may not take one
            self._seed_aware = "seed" in inspect.signature(
                dataset.__getitem__).parameters
        except (TypeError, ValueError):
            self._seed_aware = False
        self.worker_type = worker_type
        self.worker_ctx = worker_ctx  # (cfg_dict, split) for process pools
        self._proc_pool = None

    def _get_pool(self):
        """Per-iteration thread pool, or a PERSISTENT process pool (worker
        startup rebuilds the dataset — too slow to pay per epoch)."""
        if self.worker_type == "thread":
            return ThreadPoolExecutor(self.num_workers), True
        if self._proc_pool is None:
            import multiprocessing as mp
            cfg_dict, split = self.worker_ctx
            self._proc_pool = ProcessPoolExecutor(
                self.num_workers, mp_context=mp.get_context("spawn"),
                initializer=_proc_worker_init, initargs=(cfg_dict, split))
        return self._proc_pool, False

    def _submit(self, pool, index, seed):
        if self.worker_type == "thread":
            if self._seed_aware:
                return pool.submit(self.dataset.__getitem__, int(index), seed)
            return pool.submit(self.dataset.__getitem__, int(index))
        rate = getattr(self.dataset, "epoch_rate", None)
        return pool.submit(_proc_worker_getitem, int(index), rate, seed)

    def close(self):
        """Shut the persistent process pool down NOW. The task loops call
        this at teardown — relying on ``__del__`` (GC) alone leaks idle
        spawned workers for the rest of a run list that builds several
        loaders in sequence (runs/run.py)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

    def __del__(self):
        self.close()

    def set_epoch(self, epoch):
        """(reference shuffle_dataset / sampler.set_epoch)"""
        self.epoch = epoch

    def set_skip_batches(self, n):
        """One-shot: the NEXT iteration skips its first ``n`` batches.
        The index stream is a pure function of (seed, epoch, folds, host),
        so skipping the consumed prefix resumes a preempted epoch exactly
        (utils/checkpoint.py mid-epoch checkpoints)."""
        self.skip_batches = int(n)

    def _epoch_indices(self):
        """Global shuffled stream for this (fold-)epoch, host-sharded.
        Returns ``(indices, valid)``: ``valid`` marks true stream entries
        vs host-pad duplicates, so eval metrics can exclude the pads
        (the reference's ragged last batch has no such duplicates)."""
        n = len(self.dataset)
        chunks = []
        for fold in range(self.num_folds):
            idx = np.arange(n)
            if self.shuffle:
                rng = np.random.default_rng(
                    (self.seed, self.epoch, fold).__hash__() & 0x7FFFFFFF)
                rng.shuffle(idx)
            chunks.append(idx)
        idx = np.concatenate(chunks)
        valid = np.ones(len(idx), np.bool_)
        # pad so every host sees the same number of samples
        per_host = int(np.ceil(len(idx) / self.process_count))
        pad = per_host * self.process_count - len(idx)
        if pad:
            idx = np.concatenate([idx, idx[:pad]])
            valid = np.concatenate([valid, np.zeros(pad, np.bool_)])
        sl = slice(self.process_index, None, self.process_count)
        return idx[sl], valid[sl]

    def __len__(self):
        n = len(self._epoch_indices()[0])
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def _sample_seed(self, pos):
        """Per-sample augmentation seed: pure in (loader seed, epoch, host,
        stream position). Position — not index — so MultiFold/pad repeats of
        the same sample still draw fresh augmentations, and a preemption
        resume (which skips whole batches but keeps positions) replays the
        exact augmentation stream (tests/test_preemption.py)."""
        return hash((self.seed, self.epoch, self.process_index, int(pos))) \
            & 0x7FFFFFFF

    def __iter__(self):
        indices, valid = self._epoch_indices()
        batches = []
        pos = 0
        for s in range(0, len(indices), self.batch_size):
            chunk = indices[s:s + self.batch_size]
            mask = valid[s:s + self.batch_size]
            if len(chunk) < self.batch_size:
                if self.drop_last:
                    continue
                # pad the final batch by cycling the stream (static shapes
                # for jit); works even when the whole dataset is smaller
                # than one batch. TestMeter dedups by clip id; eval-in-train
                # excludes the pads via the per-sample ``_mask`` column.
                pad = np.resize(indices, self.batch_size - len(chunk))
                chunk = np.concatenate([chunk, pad])
                mask = np.concatenate(
                    [mask, np.zeros(self.batch_size - len(mask), np.bool_)])
            seeds = [self._sample_seed(pos + j) for j in range(len(chunk))]
            pos += len(chunk)
            batches.append((chunk, seeds, mask))
        if self.skip_batches:
            # backstop (load_train_checkpoint validates the loader
            # signature first): a skip past the whole epoch means the
            # geometry changed — failing loudly beats training zero batches
            # and checkpointing the epoch as complete
            assert self.skip_batches < len(batches), (
                f"resume skip {self.skip_batches} >= epoch length "
                f"{len(batches)}: loader geometry changed since the "
                "mid-epoch checkpoint")
            batches = batches[self.skip_batches:]
            self.skip_batches = 0

        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item):
            # never block forever: the consumer may abandon the iterator
            # (e.g. `next(iter(loader))`), whose finally sets `stop`; a hard
            # q.put would pin the producer, the pool, and the decoded window
            # for the process lifetime
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # decode is pipelined ACROSS batch boundaries: a bounded window
            # of per-sample futures stays in flight, so workers start batch
            # k+1 while batch k is being stacked / consumed (the reference's
            # DataLoader gets this from per-worker prefetching,
            # dataset/base/builder.py:46-93)
            import contextlib
            from collections import deque
            try:
                pool, ephemeral = self._get_pool()
                with (pool if ephemeral else contextlib.nullcontext()):
                    chunks = deque(batches)
                    chunk_futs = deque()
                    inflight = 0
                    bound = self.batch_size * (max(self.prefetch, 1) + 1)

                    def refill():
                        nonlocal inflight
                        while chunks and inflight < bound:
                            chunk, seeds, mask = chunks.popleft()
                            futs = [self._submit(pool, i, sd)
                                    for i, sd in zip(chunk, seeds)]
                            inflight += len(futs)
                            chunk_futs.append((futs, mask))

                    refill()
                    while chunk_futs and not stop.is_set():
                        futs, mask = chunk_futs.popleft()
                        samples = [f.result() for f in futs]
                        inflight -= len(futs)
                        refill()  # keep workers busy while we stack + block
                        batch = {
                            k: np.stack([s[k] for s in samples])
                            for k in samples[0]
                        }
                        if not self.drop_last:
                            # validity column for eval metrics: 0.0 marks
                            # host-shard / final-batch pad duplicates
                            batch["_mask"] = mask.astype(np.float32)
                        if self.collate_fn is not None:
                            batch = self.collate_fn(batch)
                        if not put(batch):
                            break
                    put(None)
            except BaseException as e:  # surface worker failures to the consumer
                put(e)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()


def data_axis_size(cfg):
    """Devices on the data axis (global batch = per-device batch x this).
    The reference's BATCH_SIZE is per-GPU (dataset/base/builder.py); here it
    is per-data-shard, so the loader scales it to the mesh."""
    from dist_tpu.parallel.mesh import config_data_axis_size
    return config_data_axis_size(cfg)


def build_loader(cfg, split):
    """(reference dataset/base/builder.py:46-93)"""
    import jax

    dataset = build_dataset(cfg, split)
    d = data_axis_size(cfg)
    assert d % jax.process_count() == 0, (
        f"data mesh axis ({d}) must be a multiple of the process count "
        f"({jax.process_count()}): every host feeds the same number of "
        "data shards — lower TPU.MESH.MODEL or use fewer hosts")
    scale = d // jax.process_count()
    if split == "train":
        batch_size = int(cfg.TRAIN.BATCH_SIZE) * scale
        shuffle, drop_last = True, True
        num_folds = int(cfg.TRAIN.get("NUM_FOLDS", 1))
    elif split == "val":
        batch_size = int(cfg.TRAIN.BATCH_SIZE) * scale
        shuffle, drop_last, num_folds = False, False, 1
    else:
        if cfg.get("TPU") and cfg.TPU.get("SHARD_FRAMES"):
            # frame-axis sharding spreads ONE clip's frames over the mesh;
            # the batch axis must NOT also be scaled to the device count
            # (the whole point is batch < devices serving)
            scale = 1
        batch_size = int(cfg.TEST.BATCH_SIZE) * scale
        shuffle, drop_last, num_folds = False, False, 1
    collate_fn = None
    if cfg.DATA_LOADER.get("COLLATE_FN"):
        collate_fn = COLLATE_FN_REGISTRY.get_strict(
            cfg.DATA_LOADER.COLLATE_FN)(cfg)
    worker_type = str(cfg.DATA_LOADER.get("WORKER_TYPE", "thread") or "thread")
    return Loader(
        dataset, batch_size, shuffle, drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        seed=int(cfg.RANDOM_SEED), num_folds=num_folds,
        process_index=jax.process_index(), process_count=jax.process_count(),
        prefetch=int(cfg.DATA_LOADER.get("PREFETCH", 2)),
        collate_fn=collate_fn, worker_type=worker_type,
        worker_ctx=(dataset.cfg.cfg_dict, split)
        if worker_type == "process" else None,
    )


def shuffle_dataset(loader, cur_epoch):
    loader.set_epoch(cur_epoch)
