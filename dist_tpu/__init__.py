"""dist_tpu: a TPU-native (JAX/XLA/Pallas) video-understanding framework.

Re-implements the capabilities of the DiST/TAda/HiCo reference framework
(alibaba-mmai-research/DiST) with a TPU-first design:

- functional flax models, layer-scanned transformers with explicit
  mid-feature taps (replacing the reference's mutating ``others['mid_feat']``
  dict, models/base/clip.py:151-178),
- pjit/shard_map data parallelism over a ``jax.sharding.Mesh`` (replacing
  torch DDP + NCCL, utils/launcher.py / models/base/builder.py:69-74),
- a host-decode + device-augment input pipeline (replacing decord + CUDA
  transforms, dataset/base/base_dataset.py),
- Pallas kernels for the hot attention / temporal-conv fusions,
- Orbax checkpoints with a PyTorch->JAX weight converter (replacing
  utils/checkpoint.py + process_dist_cpkt.py).
"""

__version__ = "0.1.0"
