"""Remote object-store IO (reference utils/bucket.py:13-132).

The reference talks to Alibaba OSS via oss2; TPU deployments live next to
GCS, so this is a thin retrying wrapper over ``tf.io.gfile`` (handles
``gs://``, local paths, and any registered filesystem) with the same
surface: read-to-buffer with retries, upload, local download of model
files. TensorFlow import is lazy and optional.
"""

import io
import os
import time

from dist_tpu.utils import logging

logger = logging.get_logger(__name__)


def _gfile():
    from tensorflow.io import gfile
    return gfile


def read_from_bucket(path, retries=5, base_delay=0.5):
    """Read remote bytes with exponential-backoff retry
    (reference read_from_buffer, utils/bucket.py:37-117)."""
    for attempt in range(retries):
        try:
            with _gfile().GFile(path, "rb") as f:
                return io.BytesIO(f.read())
        except Exception as e:
            if attempt == retries - 1:
                raise
            delay = base_delay * (2 ** attempt)
            logger.warning("read %s failed (%s); retry in %.1fs", path, e, delay)
            time.sleep(delay)


def put_to_bucket(local_path, remote_path, retries=3):
    """Upload a local file (reference put_to_bucket, utils/bucket.py:119-127)."""
    for attempt in range(retries):
        try:
            _gfile().copy(local_path, remote_path, overwrite=True)
            logger.info("Uploaded %s -> %s", local_path, remote_path)
            return
        except Exception as e:
            if attempt == retries - 1:
                raise
            logger.warning("upload failed (%s); retrying", e)
            time.sleep(1.0)


def download_model(remote_path, local_dir="/tmp/dist_tpu_models"):
    """Fetch a remote checkpoint locally once (reference
    download_model_from_bucket in utils/checkpoint.py)."""
    os.makedirs(local_dir, exist_ok=True)
    local_path = os.path.join(local_dir, os.path.basename(remote_path))
    if os.path.exists(local_path):
        return local_path
    buf = read_from_bucket(remote_path)
    with open(local_path, "wb") as f:
        f.write(buf.getvalue())
    return local_path


def maybe_remote(path):
    """Resolve a possibly-remote path to a local file."""
    if path and ("://" in path) and not path.startswith("file://"):
        return download_model(path)
    return path
