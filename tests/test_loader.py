"""Loader semantics: fold-epochs, shuffling, padding, host sharding."""

import numpy as np

from dist_tpu.data.builder import Loader


class _ToyDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.int64(i)}


def test_multifold_concatenates_shuffled_epochs():
    """NUM_FOLDS=3 -> one 'fold epoch' = 3 independently shuffled passes
    (reference MultiFoldDistributedSampler, utils/sampler.py:90-180)."""
    ds = _ToyDataset(10)
    loader = Loader(ds, batch_size=5, shuffle=True, drop_last=True,
                    num_workers=1, num_folds=3)
    loader.set_epoch(0)
    seen = np.concatenate([b["x"] for b in loader])
    assert len(seen) == 30
    # each fold visits every sample exactly once
    for fold in range(3):
        chunk = seen[fold * 10:(fold + 1) * 10]
        assert sorted(chunk) == list(range(10))
    # folds are shuffled differently
    assert not np.array_equal(seen[:10], seen[10:20])


def test_epoch_changes_shuffle():
    ds = _ToyDataset(16)
    loader = Loader(ds, batch_size=8, shuffle=True, drop_last=True,
                    num_workers=1)
    loader.set_epoch(0)
    a = np.concatenate([b["x"] for b in loader])
    loader.set_epoch(1)
    b = np.concatenate([b["x"] for b in loader])
    assert not np.array_equal(a, b)
    assert sorted(a) == sorted(b) == list(range(16))


def test_eval_padding_wraps_final_batch():
    ds = _ToyDataset(10)
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    num_workers=1)
    batches = list(loader)
    assert len(batches) == 3
    assert all(len(b["x"]) == 4 for b in batches)  # static shapes
    # wrap-padding repeats the stream head
    assert list(batches[-1]["x"]) == [8, 9, 0, 1]


def test_pad_mask_marks_duplicates():
    """Non-drop_last loaders emit a `_mask` validity column: 1.0 for true
    stream entries, 0.0 for final-batch pad duplicates — eval metrics weight
    by it so the epoch mean is exact when len(ds) % batch != 0."""
    ds = _ToyDataset(10)
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    num_workers=1)
    batches = list(loader)
    assert all("_mask" in b for b in batches)
    assert float(np.concatenate([b["_mask"] for b in batches]).sum()) == 10
    assert batches[-1]["_mask"].tolist() == [1.0, 1.0, 0.0, 0.0]
    # drop_last (train) loaders never pad, so no column
    tr = Loader(ds, batch_size=5, shuffle=True, drop_last=True, num_workers=1)
    assert "_mask" not in next(iter(tr))


def test_pad_mask_multihost_counts_each_sample_once():
    """Host-shard padding (ceil division across processes) is also masked:
    summing `_mask` across all hosts equals the dataset size exactly."""
    ds = _ToyDataset(11)
    total = 0.0
    for rank in range(2):
        loader = Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                        num_workers=1, process_index=rank, process_count=2)
        total += sum(float(b["_mask"].sum()) for b in loader)
    assert total == 11


def test_host_sharding_partitions_stream():
    ds = _ToyDataset(8)
    shards = []
    for rank in range(2):
        loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                        num_workers=1, process_index=rank, process_count=2)
        shards.append(np.concatenate([b["x"] for b in loader]))
    merged = sorted(np.concatenate(shards))
    assert merged == list(range(8))


def test_abandoned_iterator_releases_producer():
    """`next(iter(loader))` (the task loops' first-batch pattern) must not
    leave the producer thread blocked on a full queue forever."""
    import threading
    import time

    ds = _ToyDataset(64)
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=False,
                    num_workers=2, prefetch=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # what GC does when the generator is abandoned
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before, "producer thread leaked"


def test_multihost_index_sharding_partitions_stream():
    """Two processes see disjoint, interleaved shards that cover the epoch
    (the DistributedSampler analog), padded to equal per-host length."""
    ds = _ToyDataset(11)
    loaders = [Loader(ds, batch_size=2, shuffle=False, drop_last=False,
                      num_workers=1, process_index=i, process_count=2)
               for i in range(2)]
    streams = [l._epoch_indices()[0] for l in loaders]
    assert len(streams[0]) == len(streams[1]) == 6  # ceil(11/2), padded
    combined = sorted(int(i) for s in streams for i in s)
    assert combined == sorted(list(range(11)) + [0])  # wrap-pad with idx 0
    # equal batch counts on every host (collectives stay in lockstep)
    assert len(loaders[0]) == len(loaders[1])


def test_bpe_tokenizer_matches_canonical_clip_ids():
    """The bundled BPE vocab + tokenizer reproduce OpenAI CLIP's token ids
    exactly (sot=49406/eot=49407 framing, known ids for common words) —
    label-text classification depends on bit-exact tokenization."""
    import numpy as np
    from dist_tpu.data.tokenizer import tokenize

    t = np.asarray(tokenize(["a photo of a cat"]))
    assert t.shape == (1, 77)
    assert t[0][:7].tolist() == [49406, 320, 1125, 539, 320, 2368, 49407]
    assert t[0][7:].sum() == 0


def test_process_pool_worker_matches_thread_pool():
    """DATA_LOADER.WORKER_TYPE=process: the spawned-worker pool rebuilds the
    dataset from the pickled cfg and yields the same samples as the thread
    pool (the reference's worker-process DataLoader equivalent,
    dataset/base/builder.py:46-93)."""
    import os

    from dist_tpu.config import load_config
    from dist_tpu.data.builder import build_loader

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base_opts = ["TRAIN.BATCH_SIZE", "2", "TRAIN.NUM_SAMPLES_LIMIT", "8",
                 "DATA.NUM_INPUT_FRAMES", "2", "DATA.TRAIN_CROP_SIZE", "16",
                 "DATA.TEST_CROP_SIZE", "16", "DATA.TEST_SCALE", "16",
                 "DATA_LOADER.NUM_WORKERS", "2",
                 "OUTPUT_DIR", "/tmp/test_proc_loader"]
    cfg_t = load_config(
        os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=base_opts, make_output_dir=False)
    cfg_p = load_config(
        os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
        opts=base_opts + ["DATA_LOADER.WORKER_TYPE", "process"],
        make_output_dir=False)

    def collect(cfg):
        # val split: deterministic per-index decode/transform (train
        # injects fresh per-call randomness, base_dataset.__getitem__)
        loader = build_loader(cfg, "val")
        loader.set_epoch(0)
        out = {}
        for b in loader:
            for i, idx in enumerate(np.asarray(b["index"])):
                out[int(idx)] = (np.asarray(b["video"][i]),
                                 int(b["label"][i]))
        return out

    t, p = collect(cfg_t), collect(cfg_p)
    assert set(t) == set(p) and len(t) == 8
    for idx in t:
        assert t[idx][1] == p[idx][1]
        np.testing.assert_array_equal(t[idx][0], p[idx][0])
