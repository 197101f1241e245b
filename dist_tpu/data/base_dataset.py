"""Base video dataset (reference dataset/base/base_dataset.py).

Host-side dataset: annotation parsing, clip-seek video decode (OpenCV —
the environment's native decoder; the reference used decord), temporal
sampling, spatial crop, SSV2 flip label remap, decode-retry with neighbor
fallback. ``__getitem__`` returns numpy, shaped for the device pipeline:

    {"video": uint8 (T, S, S, 3), "label": int64, "index": int64}

Test splits replicate each video ``NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS``
times; ``index -> (clip_idx, spatial_idx)`` follows
base_dataset.py:61,271-282 so the TestMeter can regroup views by
``index // num_clips``.
"""

import abc
import functools
import json
import os

import numpy as np

from dist_tpu.data import sampling, transforms
from dist_tpu.utils import logging
from dist_tpu.utils.registry import Registry

logger = logging.get_logger(__name__)

DATASET_REGISTRY = Registry("Dataset")

# SSV2 directional classes swapped under horizontal flip
# (base_dataset.py:416-431)
SSV2_FLIP_LABEL_MAP = {86: 87, 87: 86, 93: 94, 94: 93, 166: 167, 167: 166}


def load_label_texts(cfg, anno_dir):
    """labels.json -> (class-ordered label strings, CLIP BPE tokens (C, 77)).

    The prompt/quote-strip behavior of the reference's label-text path
    (base_dataset.py:92-108), shared by datasets and the classify tool."""
    from dist_tpu.data.tokenizer import tokenize
    with open(os.path.join(anno_dir, "labels.json")) as f:
        lines = json.load(f)
    prompt = (cfg.DATA.DATASET_LABEL_TEXT.get("PROMPT_PREFIX", "")
              or cfg.DATA.DATASET_LABEL_TEXT.get("PROMPT", "") or "").strip()
    labels2text = {}
    for text, idx in lines.items():
        text = text.replace('"', "").strip()
        if prompt:
            text = prompt + " " + text
        labels2text[int(idx)] = text
    texts = [labels2text[i] for i in range(len(labels2text))]
    return texts, tokenize(texts)


def resolve_label_texts(cfg, num_classes):
    """Serving/tooling label setup -> (display names or None, CLIP tokens
    or None). One gate shared by the inference engine and classify tool:

    - tokens only for TEXT-classifier models (``DATASET_LABEL_TEXT.ENABLE``
      or a ``*Text*`` head — calling ``encode_text`` on a conv model would
      AttributeError); a labels.json next to a conv model's annotations
      still supplies display NAMES,
    - a text model with no labels.json gets generic per-class prompts so
      the tool still runs (indices only, no names)."""
    use_text = (bool(cfg.DATA.DATASET_LABEL_TEXT.ENABLE)
                or "Text" in str(cfg.VIDEO.HEAD.NAME))
    names, tokens = None, None
    anno = cfg.DATA.ANNO_DIR or ""
    if anno and os.path.exists(os.path.join(anno, "labels.json")):
        names, tokens = load_label_texts(cfg, anno)
        if not use_text:
            tokens = None
    elif use_text:
        from dist_tpu.data.tokenizer import tokenize
        tokens = tokenize([f"a video of class {i}"
                           for i in range(int(num_classes))])
    return names, tokens


def read_video(path, frame_indices):
    """Decode the given frame indices: native C++ decoder (libavcodec,
    native/videodec.cpp — the decord replacement) when built, OpenCV
    otherwise. Returns (T,H,W,3) RGB uint8."""
    from dist_tpu.data import native_decoder
    if native_decoder.available():
        return native_decoder.decode(path, np.asarray(frame_indices))
    return read_video_cv2(path, frame_indices)


def probe_video(path):
    """(num_frames, fps) via the native decoder or OpenCV."""
    from dist_tpu.data import native_decoder
    if native_decoder.available():
        n, fps, _, _ = native_decoder.probe(path)
        return n, fps
    return probe_video_cv2(path)


def read_video_cv2(path, frame_indices):
    """Decode the given frame indices with OpenCV; returns (T,H,W,3) RGB
    uint8. Sequential scan (cheap for the densely-sampled clips we use)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    wanted = {}
    max_idx = int(max(frame_indices))
    order = np.asarray(frame_indices)
    need = set(int(i) for i in order)
    i = 0
    while i <= max_idx:
        ok, frame = cap.read()
        if not ok:
            break
        if i in need:
            wanted[i] = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        i += 1
    cap.release()
    if not wanted:
        raise IOError(f"no frames decoded from {path}")
    last = wanted[max(wanted)]
    return np.stack([wanted.get(int(j), last) for j in order])


@functools.lru_cache(maxsize=65536)
def probe_video_cv2(path):
    """(num_frames, fps). Cached per path (videos are immutable; matches
    the native decoder's probe cache)."""
    import cv2
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video {path}")
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
    cap.release()
    return n, fps


class BaseVideoDataset(abc.ABC):
    # p=0.5 horizontal flip in the supervised train transform (the reference
    # puts an unconditional RandomHorizontalFlipVideo in the kinetics-family
    # train transforms, kinetics400.py:89; SSV2 instead flips via the
    # label-remap path below, so its subclass disables this).
    TRAIN_RANDOM_FLIP = True

    def __init__(self, cfg, split):
        self.cfg = cfg
        self.split = split
        self.data_root_dir = cfg.DATA.DATA_ROOT_DIR
        self.anno_dir = cfg.DATA.ANNO_DIR

        if split in ("train", "val"):
            self.dataset_name = cfg.TRAIN.DATASET
            self._num_clips = 1
        elif split in ("test", "submission"):
            self.dataset_name = cfg.TEST.DATASET
            self._num_clips = (cfg.TEST.NUM_ENSEMBLE_VIEWS
                               * cfg.TEST.NUM_SPATIAL_CROPS)
        else:
            raise NotImplementedError(f"Split {split} not supported")

        self._num_frames = cfg.DATA.NUM_INPUT_FRAMES
        self._sampling_rate = cfg.DATA.SAMPLING_RATE
        self._rand_augment = None
        self._random_erasing = None
        self._construct_dataset(cfg)

        self.text_tokens = None
        if cfg.DATA.DATASET_LABEL_TEXT.ENABLE:
            self._load_dataset_labels(cfg)

        # SSL pretraining: a view generator runs in __getitem__
        # (reference base_dataset.py:85-91,398-407)
        self.ssl_generator = None
        if cfg.PRETRAIN.ENABLE:
            from dist_tpu.ssl.generator import build_ssl_generator
            self.ssl_generator = build_ssl_generator(cfg, split)

    # ---- to be provided by subclasses ----
    @abc.abstractmethod
    def _get_dataset_list_name(self):
        ...

    @abc.abstractmethod
    def _get_sample_info(self, index):
        ...

    def _construct_dataset(self, cfg):
        """Parse the annotation list (csv/json/txt;
        base_dataset.py:187-229). Test samples are replicated per view."""
        name = self._get_dataset_list_name()
        path = os.path.join(self.anno_dir, name)
        self._samples = []
        self._spatial_temporal_index = []
        if path.endswith(".json"):
            with open(path) as f:
                samples = json.load(f)
        else:
            with open(path) as f:
                samples = [line.strip() for line in f if line.strip()]
        limit = int(self.cfg.TEST.get("NUM_SAMPLES_LIMIT", -1)
                    if self.split in ("test", "submission")
                    else self.cfg.TRAIN.get("NUM_SAMPLES_LIMIT", -1))
        if limit > 0:
            samples = samples[:limit]
        for sample in samples:
            for idx in range(self._num_clips):
                self._samples.append(sample)
                self._spatial_temporal_index.append(idx)
        assert len(self._samples) != 0, f"Loading at {path} failed."
        logger.info("Dataset %s split %s: %d samples.",
                    self.dataset_name, self.split, len(self._samples))

    def _load_dataset_labels(self, cfg):
        """labels.json -> CLIP BPE tokens (C, 77)
        (base_dataset.py:92-108)."""
        self.label_texts, self.text_tokens = load_label_texts(
            cfg, self.anno_dir)

    def __len__(self):
        return len(self._samples)

    # ---- decode ----
    def _decode_video(self, sample_info, index, rng):
        clip_idx, spatial_idx = self._view_indices(index)
        num_frames, fps = probe_video(sample_info["path"])
        n_clips = 1
        if self.ssl_generator is not None and self.split == "train":
            # SSL pretraining decodes NUM_CLIPS_PER_VIDEO temporally
            # DISTINCT clips per sample (reference base_dataset.py:285-299);
            # each clip draws its own random frame indices
            n_clips = int(self.cfg.PRETRAIN.get("NUM_CLIPS_PER_VIDEO", 1))
        if n_clips > 1:
            index_lists = [
                sampling.get_frame_indices(
                    self.cfg, num_frames, fps, clip_idx,
                    self.cfg.TEST.NUM_ENSEMBLE_VIEWS, rng=rng,
                    random_sample=True)
                for _ in range(n_clips)
            ]
            # one decoder pass over the union of indices (the decoders
            # accept arbitrary index lists; per-clip calls would rescan)
            all_idx = np.concatenate(index_lists)
            frames_all = read_video(sample_info["path"], all_idx)
            clips, s = [], 0
            for lst in index_lists:
                clips.append(frames_all[s:s + len(lst)])
                s += len(lst)
            return clips, spatial_idx
        indices = sampling.get_frame_indices(
            self.cfg, num_frames, fps, clip_idx,
            self.cfg.TEST.NUM_ENSEMBLE_VIEWS, rng=rng,
            random_sample=(self.split == "train"))
        frames = read_video(sample_info["path"], indices)
        return frames, spatial_idx

    def _view_indices(self, index):
        """index -> (clip_idx, spatial_idx) (base_dataset.py:271-282)."""
        if self.split == "train":
            return -1, -1
        if self.split == "val":
            return -1, 0
        st = self._spatial_temporal_index[index]
        clip_idx = st // self.cfg.TEST.NUM_SPATIAL_CROPS
        if self.cfg.TEST.NUM_SPATIAL_CROPS == 1:
            spatial_idx = 0
        else:
            spatial_idx = st % self.cfg.TEST.NUM_SPATIAL_CROPS
        return clip_idx, spatial_idx

    # ---- spatial transform ----
    def _transform(self, frames, spatial_idx, rng):
        cfg = self.cfg
        if self.split == "train":
            if (self.TRAIN_RANDOM_FLIP
                    and not cfg.AUGMENTATION.get("USE_GPU")
                    and rng.uniform() < 0.5):
                # flip before crop (reference kinetics400.py:86-89); skipped
                # when the on-device augmentation pipeline flips instead
                frames = transforms.horizontal_flip(frames)
            scales = cfg.DATA.TRAIN_JITTER_SCALES
            if scales[0] <= 1:
                frames = transforms.random_resized_crop(
                    frames, cfg.DATA.TRAIN_CROP_SIZE,
                    scale=scales, ratio=cfg.AUGMENTATION.RATIO, rng=rng)
            else:
                frames = transforms.kinetics_resized_crop_random(
                    frames, scales, cfg.DATA.TRAIN_CROP_SIZE, rng=rng)
            if cfg.AUGMENTATION.AUTOAUGMENT.ENABLE:
                from dist_tpu.data.rand_augment import create_auto_augmentation
                if self._rand_augment is None:
                    self._rand_augment = create_auto_augmentation(
                        cfg.AUGMENTATION.AUTOAUGMENT.TYPE,
                        cfg.DATA.TRAIN_CROP_SIZE)
                frames = self._rand_augment(frames, rng)
            elif (cfg.AUGMENTATION.COLOR_AUG
                  and not cfg.AUGMENTATION.get("USE_GPU")):
                # USE_GPU moves the color jitter inside the jitted step
                # (ops/augment_device.py) — applying it here too would
                # double-jitter every training clip
                frames = transforms.color_jitter_clip(
                    frames, rng,
                    brightness=cfg.AUGMENTATION.BRIGHTNESS,
                    contrast=cfg.AUGMENTATION.CONTRAST,
                    saturation=cfg.AUGMENTATION.SATURATION,
                    hue=cfg.AUGMENTATION.HUE,
                    grayscale=cfg.AUGMENTATION.GRAYSCALE,
                    consistent=bool(cfg.AUGMENTATION.get("CONSISTENT", True)),
                    shuffle=bool(cfg.AUGMENTATION.get("SHUFFLE", True)),
                    gray_first=bool(cfg.AUGMENTATION.get("GRAY_FIRST", True)),
                    p=float(cfg.AUGMENTATION.get("COLOR_JITTER_P", 1.0) or 0.0))
            if cfg.AUGMENTATION.RANDOM_ERASING.ENABLE:
                from dist_tpu.data.rand_augment import RandomErasing
                if self._random_erasing is None:
                    re_cfg = cfg.AUGMENTATION.RANDOM_ERASING
                    self._random_erasing = RandomErasing(
                        prob=float(re_cfg.PROB), mode=re_cfg.MODE,
                        count=tuple(re_cfg.COUNT),
                        area_range=tuple(re_cfg.AREA_RANGE),
                        min_aspect=float(re_cfg.MIN_ASPECT))
                frames = self._random_erasing(frames, rng)
        else:
            frames = transforms.kinetics_resized_crop_controlled(
                frames, cfg.DATA.TEST_SCALE, cfg.DATA.TEST_CROP_SIZE,
                cfg.TEST.NUM_SPATIAL_CROPS
                if self.split in ("test", "submission") else 1,
                spatial_idx)
        return frames

    def __getitem__(self, index, seed=None):
        """Decode-with-retry, transform, flip (+SSV2 label remap)
        (base_dataset.py:355-441).

        ``seed``: per-sample RNG seed supplied by the Loader as a pure
        function of (RANDOM_SEED, epoch, host, stream position) — makes
        train augmentation reproducible run-to-run and lets a preemption
        resume replay the exact augmentation stream
        (``tests/test_preemption.py``), while MultiFold repeats of the same
        index still draw fresh augmentations (distinct stream positions).
        Direct ``dataset[i]`` access (no seed) keeps the old behavior:
        deterministic per index for eval, fresh entropy for train.

        The mix must be stable ACROSS PROCESSES (pool workers, a resumed
        run), so no ``hash()`` on strings (PYTHONHASHSEED randomizes it) —
        crc32 for the split, integer tuple hash for the rest."""
        import zlib
        base = hash((int(self.cfg.RANDOM_SEED),
                     zlib.crc32(self.split.encode()), int(index)))
        if seed is not None:
            base = hash((base, int(seed)))
        elif self.split == "train":
            base += int(np.random.default_rng().integers(1 << 30))
        rng = np.random.default_rng(base & 0x7FFFFFFF)
        for retry in range(2 if self.split == "train" else 10):
            try:
                sample_info = self._get_sample_info(index)
                frames, spatial_idx = self._decode_video(sample_info, index, rng)
                break
            except Exception as e:  # neighbor fallback (base_dataset.py:388)
                logger.warning("decode failed for %d (%s); retry", index, e)
                index = (index + 1) % len(self._samples)
        else:
            raise IOError(f"decode failed after retries at index {index}")

        label = int(sample_info["supervised_label"]) \
            if not isinstance(sample_info["supervised_label"], dict) else 0
        if self.ssl_generator is not None:
            frames_list = frames if isinstance(frames, list) else [frames]
            views, labels = self.ssl_generator(frames_list, {}, rng)
            return {
                "video": views,
                "label": np.int64(label),
                "contrastive": labels["self-supervised"]["contrastive"],
                "index": np.int64(index),
            }

        frames = self._transform(frames, spatial_idx, rng)

        # the label-remapping flip applies ONLY to SSV2 (reference
        # base_dataset.py:416-431 guards on `"ssv2" in cfg.TRAIN.DATASET`;
        # the shipped K400 configs inherit SSV2_FLIP=true, so without the
        # dataset guard Kinetics labels 86/87, 93/94, 166/167 get swapped)
        if (self.split == "train" and self.cfg.AUGMENTATION.get("SSV2_FLIP")
                and "ssv2" in str(self.dataset_name).lower()
                and not self.cfg.PRETRAIN.ENABLE
                and rng.uniform() < 0.5):
            frames = transforms.horizontal_flip(frames)
            label = SSV2_FLIP_LABEL_MAP.get(label, label)

        item = {
            "video": np.ascontiguousarray(frames),
            "label": np.int64(label),
            "index": np.int64(index),
        }
        # dual-label datasets (EPIC verb/noun) carry extra label columns in
        # sample_info; taking them from the SAME sample_info the decode used
        # keeps them consistent with the decode-retry neighbor fallback
        for key in ("verb", "noun"):
            if key in sample_info:
                item[f"label_{key}"] = np.int64(sample_info[key])
        return item
