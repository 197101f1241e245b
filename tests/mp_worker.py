"""Worker for the real 2-process multihost test (test_multiprocess.py).

Run as: python tests/mp_worker.py <port> <process_id>
Initializes jax.distributed with 2 CPU processes x 4 virtual devices and
exercises the host-side collectives + a global-mesh psum end to end.
Exits non-zero on any mismatch.
"""

import os
import sys

port, pid = int(sys.argv[1]), int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dist_tpu.parallel import collectives as C  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert C.get_rank() == pid and C.is_master_proc() == (pid == 0)

# ---- all_gather_arrays: per-host rows concatenate in process order ----
local = np.arange(3, dtype=np.int64) + 10 * pid
ids, = C.all_gather_arrays(local)
np.testing.assert_array_equal(ids, np.concatenate([np.arange(3),
                                                   np.arange(3) + 10]))

# two arrays at once, float + 2-D
a2 = np.full((2, 2), float(pid), np.float32)
g1, g2 = C.all_gather_arrays(local, a2)
np.testing.assert_array_equal(g1, ids)
assert g2.shape == (4, 2) and g2[:2].sum() == 0 and g2[2:].sum() == 4

# ---- all_reduce_mean ----
(m,) = C.all_reduce_mean(float(pid))
assert m == 0.5, m

# ---- broadcast_from_master ----
v = C.broadcast_from_master(np.asarray([42 if pid == 0 else -1]))
assert int(np.asarray(v)[0]) == 42, v

# ---- global-mesh psum through jit (XLA collective over both processes) ----
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402

mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
local_shard = np.full((4, 2), float(pid + 1), np.float32)  # 4 rows per host
garr = multihost_utils.host_local_array_to_global_array(
    local_shard, mesh, P("data"))
with mesh:
    total = jax.jit(
        lambda x: jnp.sum(x),
        in_shardings=NamedSharding(mesh, P("data")),
        out_shardings=NamedSharding(mesh, P()),
    )(garr)
# sum = 4*2*1 + 4*2*2 = 24 on every host
assert float(total) == 24.0, float(total)

# ---- loader sharding: disjoint per-host index shards ----
from dist_tpu.config import load_config  # noqa: E402
from dist_tpu.data.builder import build_loader  # noqa: E402

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
cfg = load_config(
    os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
    opts=["TRAIN.BATCH_SIZE", "1", "TRAIN.NUM_SAMPLES_LIMIT", "16",
          "DATA_LOADER.NUM_WORKERS", "0",
          "OUTPUT_DIR", f"/tmp/mp_worker_{pid}"],
    make_output_dir=False)
loader = build_loader(cfg, "train")
seen = []
for batch in loader:
    seen.extend(np.asarray(batch["index"]).tolist())
(all_seen,) = C.all_gather_arrays(np.asarray(seen, np.int64))
assert len(set(all_seen.tolist())) == len(all_seen), "hosts overlap"
assert set(all_seen.tolist()) == set(range(16)), sorted(all_seen.tolist())

# ---- production shard_batch: per-host LOCAL batches must assemble into
# a GLOBAL batch of P x local rows (device_put would silently treat each
# host's batch as the global value and drop half of every host's data) ----
from dist_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, shard_batch  # noqa: E402
from dist_tpu.parallel.collectives import local_rows  # noqa: E402

mesh2 = Mesh(np.asarray(jax.devices()).reshape(8, 1), (DATA_AXIS, MODEL_AXIS))
local_batch = {"video": np.full((4, 2, 8, 8, 3), pid, np.uint8),
               "labels": np.arange(4, dtype=np.int64) + 100 * pid}
with mesh2:
    g = shard_batch(mesh2, local_batch)
    assert g["video"].shape == (8, 2, 8, 8, 3), g["video"].shape
    assert g["labels"].shape == (8,), g["labels"].shape
    # the jitted sum sees BOTH hosts' samples
    lab_sum = jax.jit(lambda x: jnp.sum(x),
                      out_shardings=NamedSharding(mesh2, P()))(g["labels"])
    assert int(lab_sum) == (0 + 1 + 2 + 3) * 2 + 100 * 4, int(lab_sum)
    # local_rows returns exactly this host's rows (device_get would raise)
    mine = local_rows(g["labels"])
    np.testing.assert_array_equal(mine, local_batch["labels"])

# ---- multi-view TestMeter across hosts: each host scores its own index
# shard, the gathered (preds, labels, ids) fill EVERY video slot and both
# hosts finalize identical accuracies (reference runs/test.py:131-141) ----
from dist_tpu.utils.meters import TestMeter  # noqa: E402

cfg_t = load_config(
    os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
    opts=["TEST.BATCH_SIZE", "1", "TEST.NUM_SAMPLES_LIMIT", "8",
          "DATA_LOADER.NUM_WORKERS", "0",
          "OUTPUT_DIR", f"/tmp/mp_worker_{pid}"],
    make_output_dir=False)
test_loader = build_loader(cfg_t, "test")
views = cfg_t.TEST.NUM_ENSEMBLE_VIEWS * cfg_t.TEST.NUM_SPATIAL_CROPS
num_videos = len(test_loader.dataset) // views
nc = int(cfg_t.VIDEO.HEAD.NUM_CLASSES)
meter = TestMeter(num_videos, views, nc, cfg_t, ensemble_method="sum")
for batch in test_loader:
    idx = np.asarray(batch["index"])
    labels = np.asarray(batch["label"])
    # deterministic fake scores: one-hot on (label) so accuracy must be 100
    preds = np.eye(nc, dtype=np.float32)[labels]
    g_preds, g_labels = C.all_gather_arrays(preds, labels)
    (g_ids,) = C.all_gather_arrays(idx)
    meter.update_stats(g_preds, g_labels, g_ids)
stats = meter.finalize_metrics()
assert float(stats["top1_acc"]) == 100.0, stats

# ---- EPIC dual-head meter across hosts: one-hot verb/noun scores per
# host shard must ensemble to 100% verb/noun/action accuracy on both ----
from dist_tpu.utils.meters import EpicKitchenMeter  # noqa: E402

n_videos, views, nv, nn_ = 4, 2, 3, 5
em = EpicKitchenMeter(n_videos, views, (nv, nn_), cfg_t, ensemble_method="sum")
all_ids = np.arange(n_videos * views)
my_ids = all_ids[pid::2]  # disjoint per-host shard
verb_lab = (my_ids // views) % nv
noun_lab = (my_ids // views) % nn_
local_preds = {"verb_class": np.eye(nv, dtype=np.float32)[verb_lab],
               "noun_class": np.eye(nn_, dtype=np.float32)[noun_lab]}
g_verb, g_noun = C.all_gather_arrays(local_preds["verb_class"],
                                     local_preds["noun_class"])
g_vl, g_nl = C.all_gather_arrays(verb_lab, noun_lab)
(g_ids2,) = C.all_gather_arrays(my_ids)
em.update_stats({"verb_class": g_verb, "noun_class": g_noun},
                {"verb_class": g_vl, "noun_class": g_nl}, g_ids2)
estats = em.finalize_metrics()
for key in ("verb_top1_acc", "noun_top1_acc", "action_top1_acc"):
    assert float(estats[key]) == 100.0, (key, estats)

# ---- multi-host checkpoint: collective save -> restore -> resume ----
# Every process calls save_checkpoint on the SHARDED jax.Array state
# (orbax writes each shard exactly once, replicated/numpy leaves from the
# primary host only — the multihost contract of utils/checkpoint.py that
# replaces the reference's master-only torch.save, checkpoint.py:102-143).
# Both hosts then restore the identical state and resume on the fold grid.
import shutil  # noqa: E402

from dist_tpu.tasks.state import TrainState  # noqa: E402
from dist_tpu.utils import checkpoint as cu  # noqa: E402

ckpt_root = f"/tmp/mp_ckpt_{port}"  # SHARED dir: both processes write here
if pid == 0:
    shutil.rmtree(ckpt_root, ignore_errors=True)
C.synchronize()
cfg_c = load_config(
    os.path.join(repo, "configs/projects/dist/test/tiny_synth.yaml"),
    opts=["OUTPUT_DIR", ckpt_root, "TRAIN.NUM_FOLDS", "2",
          "OPTIMIZER.MAX_EPOCH", "8", "TRAIN.AUTO_RESUME", "true",
          "TRAIN.CHECKPOINT_PERIOD", "2"],
    make_output_dir=(pid == 0))
C.synchronize()

repl = NamedSharding(mesh2, P())
sharded = NamedSharding(mesh2, P(DATA_AXIS))
w = jax.device_put(np.arange(8, dtype=np.float32) * 3.0, repl)
# per-host opt rows differ so a swapped/garbled shard write is detectable
local_opt = np.arange(8, dtype=np.float32).reshape(4, 2) + 100.0 * pid
opt = multihost_utils.host_local_array_to_global_array(
    local_opt, mesh2, P(DATA_AXIS))
state_c = TrainState(step=jax.device_put(jnp.int32(17), repl),
                     variables={"params": {"w": w}},
                     opt_state={"mu": opt})
saved_path = cu.save_checkpoint(cfg_c, state_c, cur_epoch=2)
assert saved_path.endswith("checkpoint_epoch_00004"), saved_path
assert cu.get_last_checkpoint(cfg_c) == saved_path

template = TrainState(
    step=jax.device_put(jnp.int32(0), repl),
    variables={"params": {"w": jax.device_put(jnp.zeros(8), repl)}},
    opt_state={"mu": multihost_utils.host_local_array_to_global_array(
        np.zeros((4, 2), np.float32), mesh2, P(DATA_AXIS))})
restored, start_epoch, _ = cu.load_train_checkpoint(cfg_c, template)
# fold-grid resume: stored epoch = cur_epoch + NUM_FOLDS = 4, and the
# remaining span (8 - 4) stays divisible by NUM_FOLDS
assert start_epoch == 4, start_epoch
assert (int(cfg_c.OPTIMIZER.MAX_EPOCH) - start_epoch) % 2 == 0
assert int(np.asarray(restored.step)) == 17
np.testing.assert_array_equal(np.asarray(restored.variables["params"]["w"]),
                              np.asarray(w))
# the restored opt state keeps the data-axis sharding and THIS host's rows
r_mu = restored.opt_state["mu"]
assert not r_mu.is_fully_replicated, r_mu.sharding
np.testing.assert_array_equal(local_rows(r_mu), local_opt)
# identical restored scalars on both hosts
(w_sum_all,) = C.all_gather_arrays(
    np.asarray([float(np.asarray(restored.variables["params"]["w"]).sum())]))
assert np.unique(w_sum_all).size == 1, w_sum_all

C.synchronize()

# ---- mid-epoch (preemption) checkpoint, multihost: on SIGTERM every host
# enters the SAME collective save with (epoch, iter); restore surfaces
# both so each host skips the same prefix of its own index stream
# (tasks/train.py preemption path; docs/MULTIHOST.md) ----
mid_state = TrainState(step=jax.device_put(jnp.int32(21), repl),
                       variables={"params": {"w": w}},
                       opt_state={"mu": opt})
mid_path = cu.save_checkpoint(cfg_c, mid_state, cur_epoch=4, iter_in_epoch=3)
assert mid_path.endswith("checkpoint_epoch_00004_iter_0000003"), mid_path
assert cu.get_last_checkpoint(cfg_c) == mid_path  # outranks epoch_00004
restored2, start_epoch2, start_iter2 = cu.load_train_checkpoint(
    cfg_c, template)
assert (start_epoch2, start_iter2) == (4, 3), (start_epoch2, start_iter2)
assert int(np.asarray(restored2.step)) == 21
np.testing.assert_array_equal(local_rows(restored2.opt_state["mu"]),
                              local_opt)

# ---- retention GC, multihost: primary-only deletion on the shared dir;
# after the barrier BOTH hosts see only the newest KEEP_LAST=1 ----
cfg_c.TRAIN.CHECKPOINT_KEEP_LAST = 1
cu.prune_old_checkpoints(cfg_c)
C.synchronize()
left = sorted(n for n in os.listdir(cu.checkpoint_dir(cfg_c))
              if n.startswith("checkpoint_")
              and os.path.isdir(os.path.join(cu.checkpoint_dir(cfg_c), n)))
assert left == ["checkpoint_epoch_00004_iter_0000003"], left

C.synchronize()
if pid == 0:
    shutil.rmtree(ckpt_root, ignore_errors=True)
print(f"mp_worker {pid}: OK")
