"""Concrete datasets (reference dataset/base/{ssv2,kinetics400,...}.py).

All register into DATASET_REGISTRY; names resolve via ``capitalize()`` like
the reference's builder (dataset/base/builder.py:112-123). ``Synthetic``
generates deterministic random videos for tests/benchmarks (no data files
— the no-data analog of the reference's golden-number evaluation)."""

import json
import os

import numpy as np

from dist_tpu.data.base_dataset import BaseVideoDataset, DATASET_REGISTRY
from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


@DATASET_REGISTRY.register()
class Ssv2(BaseVideoDataset):
    """Something-Something-V2 (reference dataset/base/ssv2.py:32-152)."""

    # SSV2 flips only through the label-remap path (temporal direction
    # matters); the reference ssv2 train transform has no flip.
    TRAIN_RANDOM_FLIP = False

    def _get_dataset_list_name(self):
        return "something-something-v2-{}-with-label.json".format(
            "train" if self.split == "train" else "validation")

    def _get_sample_info(self, index):
        s = self._samples[index]
        return {
            "path": os.path.join(self.data_root_dir, s["id"] + ".mp4"),
            "supervised_label": int(s["label_idx"]),
        }


class _CsvListDataset(BaseVideoDataset):
    """Datasets whose lists are ``relpath label`` text lines
    (kinetics400.py:33-203, ucf101/hmdb51)."""

    def _get_sample_info(self, index):
        line = self._samples[index]
        parts = line.replace(",", " ").split()
        path, label = parts[0], int(parts[-1])
        return {
            "path": os.path.join(self.data_root_dir, path),
            "supervised_label": label,
        }


@DATASET_REGISTRY.register()
class Kinetics400(_CsvListDataset):
    def _get_dataset_list_name(self):
        return f"kinetics400_{self.split if self.split != 'submission' else 'test'}_list.txt"


@DATASET_REGISTRY.register()
class Kinetics700(_CsvListDataset):
    def _get_dataset_list_name(self):
        return f"kinetics700_{self.split}_list.txt"


@DATASET_REGISTRY.register()
class Ucf101(_CsvListDataset):
    def _get_dataset_list_name(self):
        return f"ucf101_{'train' if self.split == 'train' else 'test'}_list.txt"


@DATASET_REGISTRY.register()
class Hmdb51(_CsvListDataset):
    def _get_dataset_list_name(self):
        return f"hmdb51_{'train' if self.split == 'train' else 'test'}_list.txt"


@DATASET_REGISTRY.register()
class Synthetic(BaseVideoDataset):
    """Deterministic random-video dataset for tests/bench; honors the full
    view-replication / sampling / transform path without touching disk."""

    NUM_SYNTH = 32
    TRAIN_RANDOM_FLIP = False  # keep synthetic batches deterministic

    def _construct_dataset(self, cfg):
        n = int(cfg.TRAIN.get("NUM_SAMPLES_LIMIT", -1))
        if self.split in ("test", "submission"):
            n = int(cfg.TEST.get("NUM_SAMPLES_LIMIT", -1))
        n = n if n > 0 else self.NUM_SYNTH
        self._samples = []
        self._spatial_temporal_index = []
        for i in range(n):
            for idx in range(self._num_clips):
                self._samples.append(i)
                self._spatial_temporal_index.append(idx)

    def _get_dataset_list_name(self):
        return ""

    def _get_sample_info(self, index):
        vid = self._samples[index]
        nc = self.cfg.VIDEO.HEAD.NUM_CLASSES
        if isinstance(nc, (list, tuple)):
            # dual-head (EPIC verb/noun) configs: synthesize both labels
            return {"path": f"synthetic://{vid}",
                    "supervised_label": vid % int(nc[0]),
                    "verb": vid % int(nc[0]), "noun": vid % int(nc[1])}
        return {"path": f"synthetic://{vid}",
                "supervised_label": vid % int(nc or 10)}

    def _decode_video(self, sample_info, index, rng):
        clip_idx, spatial_idx = self._view_indices(index)
        vid = int(sample_info["path"].split("//")[1])
        size = max(self.cfg.DATA.TRAIN_CROP_SIZE, self.cfg.DATA.TEST_CROP_SIZE,
                   self.cfg.DATA.TEST_SCALE)

        def clip(seed):
            g = np.random.default_rng(seed)
            return g.integers(0, 256, (self._num_frames, size, size, 3),
                              dtype=np.uint8)

        if self.ssl_generator is not None and self.split == "train":
            n_clips = int(self.cfg.PRETRAIN.get("NUM_CLIPS_PER_VIDEO", 1))
            if n_clips > 1:
                # distinct "temporal positions" = distinct seeds
                return [clip((vid, i).__hash__() & 0x7FFFFFFF)
                        for i in range(n_clips)], spatial_idx
        return clip(vid), spatial_idx

    def _load_dataset_labels(self, cfg):
        nc = cfg.VIDEO.HEAD.NUM_CLASSES
        if isinstance(nc, (list, tuple)):
            return  # dual-head configs don't use the CLIP label-text path
        from dist_tpu.data.tokenizer import tokenize
        n = int(nc or 10)
        self.text_tokens = tokenize([f"synthetic class {i}" for i in range(n)])


@DATASET_REGISTRY.register()
class Epickitchen100(BaseVideoDataset):
    """EPIC-KITCHENS-100 with verb/noun dual labels.

    The reference ships the EPIC heads/meters/configs but no dataset class;
    this completes the path. List format: ``relpath verb_id noun_id`` per
    line (``epickitchen100_{split}_list.txt``).
    """

    def _get_dataset_list_name(self):
        split = "train" if self.split == "train" else "test"
        return f"epickitchen100_{split}_list.txt"

    def _get_sample_info(self, index):
        parts = self._samples[index].replace(",", " ").split()
        path, verb, noun = parts[0], int(parts[1]), int(parts[2])
        return {
            "path": os.path.join(self.data_root_dir, path),
            "supervised_label": verb,  # primary label slot
            # picked up as label_verb/label_noun by the base __getitem__
            "verb": verb,
            "noun": noun,
        }
