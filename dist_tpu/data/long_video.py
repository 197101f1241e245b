"""Untrimmed long-video dataset for HiCo/HiCo++ pretraining and TAL
(reference dataset/base/long_video.py:40-194 + the HiCo clip-placement
sampling at base_dataset.py:586-652).

Annotation format: ``{split}.txt`` lines ``video_name,start_ms,end_ms``
grouping sub-clips of each untrimmed video; one dataset sample = one
untrimmed video, from which NUM_CLIPS_PER_VIDEO clips are placed by the
HiCo strategy:

- VCL: clip pairs within ``HICO.VCL.MAX_DIS`` seconds of each other,
- GRADUAL: the max distance anneals from MAX_DIS[0] to MAX_DIS[1] over
  training (the epoch progress is passed EXPLICITLY via ``set_epoch_rate``
  — replacing the reference's filesystem IPC through ./current_epoch/,
  runs/train.py:29-37 / base_dataset.py:614-618),
- TCL: the final clip is placed freely (a distant "topic" sample),
- HiCo++ dual placement (pairs: free+near) via ``HICO_PLUS_PLUS.ENABLE``.
"""

import os

import numpy as np

from dist_tpu.data.base_dataset import (
    BaseVideoDataset,
    DATASET_REGISTRY,
    probe_video_cv2,
    read_video_cv2,
)
from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


@DATASET_REGISTRY.register()
class Longvideo(BaseVideoDataset):
    SPLIT_TABLE = {"train": "training", "test": "testing", "val": "validation"}

    def __init__(self, cfg, split):
        self.epoch_rate = 0.0
        super().__init__(cfg, split)

    def set_epoch_rate(self, rate):
        """Curriculum progress in [0, 1] (explicit replacement for the
        reference's ./current_epoch/ files)."""
        self.epoch_rate = float(rate)

    def _get_dataset_list_name(self):
        return f"{self.SPLIT_TABLE[self.split]}.txt"

    def _construct_dataset(self, cfg):
        path = os.path.join(self.anno_dir, self._get_dataset_list_name())
        self._samples = []
        self._spatial_temporal_index = []
        self._video_clips = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                video_name, start_ms, end_ms = line.split(",")
                if video_name not in self._video_clips:
                    self._video_clips[video_name] = []
                    self._samples.append(video_name)
                    self._spatial_temporal_index.append(0)
                self._video_clips[video_name].append(
                    (int(start_ms) / 1000.0, int(end_ms) / 1000.0))
        assert self._samples, f"Loading at {path} failed."
        logger.info("Longvideo split %s: %d videos.", self.split,
                    len(self._samples))

    def _get_sample_info(self, index):
        video_name = self._samples[index]
        clips = self._video_clips[video_name]
        duration = clips[-1][1]
        return {"path": video_name, "supervised_label": 0,
                "duration": duration, "clips": clips}

    # ---- HiCo clip placement ----

    def _clip_centers(self, duration, rng):
        cfg = self.cfg
        clip_time = (self._num_frames * self._sampling_rate
                     / cfg.DATA.TARGET_FPS)
        n = int(cfg.PRETRAIN.get("NUM_CLIPS_PER_VIDEO", 2))
        hico = cfg.get("HICO")

        def rc(lo, hi):
            hi = max(hi, lo)
            return lo + (hi - lo) * rng.uniform()

        max_dis = -1.0
        tcl_free_last = False
        if hico is not None:
            if hico.get("GRAUDAL_SAMPLING") and hico.GRAUDAL_SAMPLING.ENABLE:
                lo, hi = hico.GRAUDAL_SAMPLING.MAX_DIS
                max_dis = lo + (hi - lo) * min(max(self.epoch_rate, 0.0), 1.0)
            elif hico.get("VCL") and hico.VCL.ENABLE:
                max_dis = float(hico.VCL.MAX_DIS)
            tcl_free_last = bool(hico.get("TCL") and hico.TCL.ENABLE)

        lo, hi = clip_time, duration - clip_time
        if cfg.DATA.HICO_PLUS_PLUS.ENABLE:
            assert n % 2 == 0
            tcl_max_dis = float(hico.TCL.get("MAX_DIS", -1.0)) if hico else -1.0
            centers = []
            for _ in range(n // 2):
                if max_dis < 0:
                    centers.append(rc(lo, hi))
                    centers.append(rc(lo, hi))
                else:
                    if tcl_max_dis >= 0 and centers:
                        centers.append(rc(max(centers[-1] - tcl_max_dis, lo),
                                          min(centers[-1] + tcl_max_dis, hi)))
                    else:
                        centers.append(rc(lo, hi))
                    centers.append(rc(max(centers[-1] - max_dis, lo),
                                      min(centers[-1] + max_dis, hi)))
            return centers, clip_time
        centers = [rc(lo, hi)]
        for _ in range(n - 1):
            if max_dis < 0:
                centers.append(rc(lo, hi))
            else:
                centers.append(rc(max(centers[-1] - max_dis, lo),
                                  min(centers[-1] + max_dis, hi)))
        if tcl_free_last:
            centers[-1] = rc(lo, hi)
        return centers, clip_time

    def _decode_video(self, sample_info, index, rng):
        """Decode one frame stack per placed clip, reading from the
        sub-clip file covering each time window."""
        duration = sample_info["duration"]
        clips = sample_info["clips"]
        centers, clip_time = self._clip_centers(duration, rng)

        frames_list = []
        for c in centers:
            t0 = max(c - clip_time / 2, 0.0)
            # find the sub-clip file containing t0
            ci = 0
            for i, (s, e) in enumerate(clips):
                if s <= t0 < e:
                    ci = i
                    break
            path = self._clip_path(sample_info["path"], clips[ci])
            num_frames, fps = probe_video_cv2(path)
            local_t = t0 - clips[ci][0]
            start = int(np.clip(local_t * fps, 0, max(num_frames - 1, 0)))
            span = int(clip_time * fps)
            idx = np.linspace(start, min(start + span, num_frames - 1),
                              self._num_frames).astype(np.int64)
            frames_list.append(read_video_cv2(path, idx))
        # list-valued: the SSL generator makes one view per placed clip
        return frames_list, 0

    def _clip_path(self, video_name, clip):
        s, e = int(clip[0] * 1000), int(clip[1] * 1000)
        sub = self.SPLIT_TABLE[self.split]
        return os.path.join(self.data_root_dir, sub,
                            f"v_{video_name}_{s}_{e}.mp4")
