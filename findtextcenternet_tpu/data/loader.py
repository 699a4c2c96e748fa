"""Multiprocess host data loader feeding the TPU training loop.

Replaces the reference's DataLoader + ZMQ ``MultiLoader``
(`/root/reference/dataset/multi.py:88-177`): N worker processes pull shard
paths from a queue, decode + augment samples, and push ready device batches
through a bounded queue (backpressure = queue bound, instead of the
reference's PUB/SUB sleep protocol). Designed per-host: under multi-host
data parallelism each host feeds its own shard subset.
"""
from __future__ import annotations

import multiprocessing as mp
import random
from typing import Dict, Iterator, List, Optional

import numpy as np

from .augment import process_sample
from .shards import iter_tar_samples, open_shard_stream

_STOP = "__stop__"


def _rename_reference_keys(sample: Dict) -> Dict:
    """Map shard member names to pipeline keys."""
    out = {}
    for k, v in sample.items():
        base = k.split(".")[0]
        out[base] = v
    # grayscale page images arrive as uint8 arrays already
    return out


def _worker(shard_queue: mp.Queue, out_queue: mp.Queue, seed: int,
            shuffle_buf: int, out_hw=None):
    rng = np.random.default_rng(seed)
    buf: List[Dict] = []
    while True:
        shard = shard_queue.get()
        if shard == _STOP:
            break
        try:
            stream = open_shard_stream(shard)
            for raw in iter_tar_samples(stream):
                s = _rename_reference_keys(raw)
                if not {"image", "textline", "sepline", "position",
                        "code_list"} <= set(s):
                    continue
                s["position"] = np.asarray(s["position"], np.float32)
                s["code_list"] = np.asarray(s["code_list"], np.int32)
                buf.append(s)
                if len(buf) >= shuffle_buf:
                    i = int(rng.integers(len(buf)))
                    buf[i], buf[-1] = buf[-1], buf[i]
                    item = buf.pop()
                    out_queue.put(process_sample(item, rng, out_hw=out_hw)
                                  if out_hw else process_sample(item, rng))
        except Exception as e:  # keep the pipeline alive on bad shards
            out_queue.put({"__error__": repr(e), "__shard__": str(shard)})
    # the tail flush must not be able to kill the worker before _STOP is
    # enqueued — one bad buffered sample would leave the consumer
    # blocked forever on a stop count that never completes
    try:
        for item in buf:
            out_queue.put(process_sample(item, rng, out_hw=out_hw)
                          if out_hw else process_sample(item, rng))
    except Exception as e:
        out_queue.put({"__error__": repr(e), "__shard__": "<tail-buffer>"})
    out_queue.put(_STOP)


class DetectorLoader:
    """Streams augmented, batched detector training samples."""

    def __init__(self, shards: List[str], batch_size: int,
                 num_workers: int = 4, seed: int = 0,
                 shuffle_buf: int = 64, repeat: bool = True,
                 max_prefetch: int = 8, out_hw=None):
        self.shards = list(shards)
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shuffle_buf = shuffle_buf
        self.repeat = repeat
        self.max_prefetch = max_prefetch
        self.out_hw = out_hw
        self._procs: List[mp.Process] = []
        self._out: Optional[mp.Queue] = None
        self._shard_q: Optional[mp.Queue] = None

    def _start(self):
        ctx = mp.get_context("fork")
        self._shard_q = ctx.Queue()
        self._out = ctx.Queue(maxsize=self.max_prefetch * self.batch_size)
        order = list(self.shards)
        random.Random(self.seed).shuffle(order)
        for s in order:
            self._shard_q.put(s)
        for _ in range(self.num_workers):
            self._shard_q.put(_STOP)
        for i in range(self.num_workers):
            p = ctx.Process(target=_worker,
                            args=(self._shard_q, self._out,
                                  self.seed + i, self.shuffle_buf,
                                  self.out_hw),
                            daemon=True)
            p.start()
            self._procs.append(p)

    def _stop(self):
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        for p in self._procs:
            p.join(timeout=2)
            if p.is_alive():       # blocked in a queue put: force kill
                p.kill()
                p.join(timeout=2)
        self._procs = []

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = 0
        while True:
            self._start()
            stops = 0
            batch: List[Dict] = []
            while stops < self.num_workers:
                item = self._out.get()
                if item == _STOP:
                    stops += 1
                    continue
                if "__error__" in item:
                    print("loader: shard error", item, flush=True)
                    continue
                batch.append(item)
                if len(batch) == self.batch_size:
                    yield _collate(batch)
                    batch = []
            self._stop()
            epoch += 1
            if not self.repeat:
                break
            self.seed += 1000


def _collate(batch: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([b[k] for b in batch]) for k in batch[0]}
