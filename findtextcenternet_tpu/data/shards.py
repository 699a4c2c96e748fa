"""WebDataset-style tar shard reader/writer (no external deps).

The reference streams training shards as tars of
``{key}.image.png / .textline.png / .sepline.png / .position.npy /
.code_list.npy / .txt`` via the webdataset package
(`/root/reference/dataset/data_detector.py:61-98`,
`/root/reference/make_traindata/make_traindata1.py:47-65`). This module
reads and writes the same format with the stdlib, so shards are
interchangeable between the two stacks.
"""
from __future__ import annotations

import io
import os
import tarfile
from typing import Dict, Iterator, List, Optional

import numpy as np


def _ext(name: str) -> str:
    return name.rsplit(".", 1)[-1]


def _decode_member(name: str, data: bytes):
    ext = _ext(name)
    if ext == "npy":
        return np.load(io.BytesIO(data), allow_pickle=False)
    if ext in ("png", "jpg", "jpeg"):
        from PIL import Image
        return np.asarray(Image.open(io.BytesIO(data)))
    if ext == "txt":
        return data.decode("utf-8")
    return data


def iter_tar_samples(path_or_stream) -> Iterator[Dict[str, object]]:
    """Yield grouped samples from a tar shard.

    Members are grouped by key prefix (everything before the first '.');
    each sample dict maps the remaining suffix ('image.png', ...) to the
    decoded value, plus '__key__'.
    """
    mode = "r|*" if hasattr(path_or_stream, "read") else "r:*"
    src = path_or_stream if hasattr(path_or_stream, "read") else None
    tf = tarfile.open(fileobj=src, name=None if src else path_or_stream,
                      mode=mode)
    current_key: Optional[str] = None
    sample: Dict[str, object] = {}
    with tf:
        for member in tf:
            if not member.isfile():
                continue
            base = os.path.basename(member.name)
            if "." not in base:
                continue
            key, suffix = base.split(".", 1)
            if current_key is not None and key != current_key:
                if sample:
                    sample["__key__"] = current_key
                    yield sample
                sample = {}
            current_key = key
            data = tf.extractfile(member).read()
            sample[suffix] = _decode_member(suffix, data)
        if sample and current_key is not None:
            sample["__key__"] = current_key
            yield sample


class ShardWriter:
    """Write samples into numbered tar shards (``pattern % index``)."""

    def __init__(self, pattern: str, samples_per_shard: int = 100):
        self.pattern = pattern
        self.samples_per_shard = samples_per_shard
        self._tar: Optional[tarfile.TarFile] = None
        self._count = 0
        self._shard = 0
        self.paths: List[str] = []

    def _open_next(self):
        if self._tar is not None:
            self._tar.close()
        path = self.pattern % self._shard
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._tar = tarfile.open(path, "w")
        self.paths.append(path)
        self._shard += 1
        self._count = 0

    def write(self, sample: Dict[str, object]):
        if self._tar is None or self._count >= self.samples_per_shard:
            self._open_next()
        key = sample.get("__key__", f"{self._shard:06d}{self._count:06d}")
        for suffix, value in sample.items():
            if suffix == "__key__":
                continue
            data = _encode_member(suffix, value)
            info = tarfile.TarInfo(name=f"{key}.{suffix}")
            info.size = len(data)
            self._tar.addfile(info, io.BytesIO(data))
        self._count += 1

    def close(self):
        if self._tar is not None:
            self._tar.close()
            self._tar = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def _encode_member(name: str, value) -> bytes:
    ext = _ext(name)
    if isinstance(value, bytes):
        return value
    if ext == "npy":
        buf = io.BytesIO()
        np.save(buf, np.asarray(value), allow_pickle=False)
        return buf.getvalue()
    if ext in ("png", "jpg", "jpeg"):
        from PIL import Image
        buf = io.BytesIO()
        arr = np.asarray(value)
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()
    if ext == "txt" or isinstance(value, str):
        return str(value).encode("utf-8")
    raise TypeError(f"cannot encode member {name}: {type(value)}")


def open_shard_stream(url_or_path: str):
    """Open a shard: local path directly, http(s) via the native
    ``downloader`` streamer when built (resume/retry), else urllib."""
    if url_or_path.startswith(("http://", "https://")):
        import subprocess
        dl = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                          "downloader", "downloader")
        dl = os.path.abspath(dl)
        if os.path.exists(dl):
            proc = subprocess.Popen([dl, url_or_path],
                                    stdout=subprocess.PIPE)
            return proc.stdout
        import urllib.request
        return urllib.request.urlopen(url_or_path)
    return open(url_or_path, "rb")
