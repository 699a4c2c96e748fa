"""ZMQ-based multiprocess loader (alternative transport).

Equivalent of the reference's ``MultiLoader``
(`/root/reference/dataset/multi.py:88-177`): N forked reader processes
PUSH pickled samples over ipc sockets; a PUB/SUB channel implements
backpressure (readers pause when the consumer falls behind). The default
loader (`.loader.DetectorLoader`) uses mp.Queue; this one exists for
parity and for cross-process decoupling on busy hosts.
"""
from __future__ import annotations

import pickle
import tempfile
import time
from typing import Callable, Iterator, List

import numpy as np

_EOF = b"__eof__"


def _reader(worker_id: int, num_workers: int, shards: List[str],
            push_addr: str, sub_addr: str, seed: int,
            process_fn: Callable):
    import zmq

    ctx = zmq.Context()
    push = ctx.socket(zmq.PUSH)
    push.connect(push_addr)
    sub = ctx.socket(zmq.SUB)
    sub.connect(sub_addr)
    sub.setsockopt(zmq.SUBSCRIBE, b"")

    from .shards import iter_tar_samples, open_shard_stream

    rng = np.random.default_rng(seed)
    sent = 0
    consumed = 0  # global consumed count published by the consumer
    for shard in shards:
        try:
            for raw in iter_tar_samples(open_shard_stream(shard)):
                sample = {k.split(".")[0]: v for k, v in raw.items()}
                if not {"image", "textline", "sepline", "position",
                        "code_list"} <= set(sample):
                    continue
                sample["position"] = np.asarray(sample["position"],
                                                np.float32)
                sample["code_list"] = np.asarray(sample["code_list"],
                                                 np.int32)
                out = process_fn(sample, rng)
                push.send(pickle.dumps(out, protocol=4))
                sent += 1
                # Backpressure (reference multi.py:63-72): the consumer
                # PUBlishes its *global* consumed count; each reader
                # pauses while its own sent count exceeds its fair share
                # (global/num_workers) by more than 2.
                while sent > consumed / num_workers + 2:
                    try:
                        consumed = int(sub.recv(zmq.NOBLOCK))
                    except zmq.Again:
                        time.sleep(0.005)
        except Exception as e:
            print(f"zmq reader {worker_id}: shard error {e}", flush=True)
    push.send(_EOF)


class ZmqLoader:
    """PUSH/PULL sample stream with PUB/SUB backpressure."""

    def __init__(self, shards: List[str], num_workers: int = 4,
                 seed: int = 0, process_fn: Callable = None):
        from .augment import process_sample

        self.shards = list(shards)
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.process_fn = process_fn or process_sample
        self._procs = []

    def __iter__(self) -> Iterator[dict]:
        import multiprocessing as mp

        import zmq

        tmp = tempfile.mkdtemp(prefix="ftc_zmq_")
        pull_addr = f"ipc://{tmp}/pull"
        pub_addr = f"ipc://{tmp}/pub"

        ctx = zmq.Context()
        pull = ctx.socket(zmq.PULL)
        pull.bind(pull_addr)
        pub = ctx.socket(zmq.PUB)
        pub.bind(pub_addr)

        mpctx = mp.get_context("fork")
        chunks = [self.shards[i::self.num_workers]
                  for i in range(self.num_workers)]
        for i, chunk in enumerate(chunks):
            p = mpctx.Process(target=_reader,
                              args=(i, self.num_workers, chunk,
                                    pull_addr, pub_addr,
                                    self.seed + i, self.process_fn),
                              daemon=True)
            p.start()
            self._procs.append(p)

        # Exposed on self so tests (and monitoring) can observe transport
        # state mid-stream.
        self._pull = pull
        self._pub = pub
        self._consumed = 0
        self._eofs = 0
        poller = zmq.Poller()
        poller.register(pull, zmq.POLLIN)
        try:
            while self._eofs < self.num_workers:
                if not dict(poller.poll(100)):
                    # Heartbeat republish: PUB drops messages for not-yet-
                    # connected SUB sockets (slow joiner), so a reader that
                    # missed the early counts would block forever while we
                    # block in recv() — republishing when idle breaks the
                    # deadlock.
                    pub.send(str(self._consumed).encode())
                    continue
                msg = pull.recv()
                if msg == _EOF:
                    self._eofs += 1
                    continue
                self._consumed += 1
                pub.send(str(self._consumed).encode())
                yield pickle.loads(msg)
        finally:
            for p in self._procs:
                if p.is_alive():
                    p.terminate()
            self._procs = []
            pull.close(0)
            pub.close(0)
