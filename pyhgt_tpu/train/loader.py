"""Async sampler→device prefetch pipeline.

Replaces the reference's double-buffered ``mp.Pool`` (submit next epoch's
sampling jobs, then train on the previous epoch's results —
``/root/reference/OAG/train_paper_field.py:141-153,214-231``) with a
thread-pool producer + bounded queue + ``jax.device_put`` prefetch:

- N worker threads run the (numpy/C++) sampler; each job gets a fresh
  32-bit seed exactly like the reference's ``randint()`` per-job seeding
  (``pyHGT/utils.py:42-43``, used at ``OAG/train_paper_field.py:147``);
- finished batches are asynchronously transferred to device so the TPU
  never waits on PCIe (the reference instead pays a ``.to(device)`` on the
  critical path every batch, ``train_paper_field.py:242-243``);
- ``repeat`` re-yields each sampled batch k times
  (``--repeat``, ``train_paper_field.py:57-58,240``).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import jax
import numpy as np


class PrefetchLoader:
    """Continuous batch producer with device prefetch.

    ``sample_fn(rng: np.random.Generator) -> pytree`` produces one host
    batch (e.g. task sampling + ``pad_sample``). Iterating the loader
    yields device-resident batches.
    """

    def __init__(
        self,
        sample_fn: Callable[[np.random.Generator], object],
        n_workers: int = 4,
        queue_size: int = 8,
        repeat: int = 1,
        seed: Optional[int] = None,
        device=None,
        stack: int = 1,
        collate: Optional[Callable] = None,
    ) -> None:
        """``stack > 1`` collects that many host items per yielded batch and
        combines them with ``collate(items)`` (default: tree-stack on a new
        leading axis) before the device transfer — the data-parallel feed
        (pass ``device=NamedSharding(mesh, P('data'))`` to shard the stack
        over the mesh)."""
        self.sample_fn = sample_fn
        self.n_workers = n_workers
        self.repeat = repeat
        self.device = device
        self.stack = stack
        self.collate = collate or (
            lambda items: jax.tree.map(lambda *xs: np.stack(xs), *items)
        )
        self._host_q: "queue.Queue" = queue.Queue(maxsize=queue_size)
        self._stop = threading.Event()
        self._failed = threading.Event()
        self._seed_rng = np.random.default_rng(seed)
        self._seed_lock = threading.Lock()
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(n_workers)
        ]
        self._started = False

    # -- producer side ------------------------------------------------------
    def _next_seed(self) -> int:
        # fresh 32-bit seed per job — decorrelated workers, reproducible
        # stream given the loader seed (cf. pyHGT/utils.py:42-43)
        with self._seed_lock:
            return int(self._seed_rng.integers(0, 2**31 - 1))

    def _worker(self) -> None:
        while not self._stop.is_set():
            rng = np.random.default_rng(self._next_seed())
            try:
                batch = self.sample_fn(rng)
            except Exception as e:  # fail fast, surface in consumer
                self._failed.set()  # __iter__ raises instead of blocking
                self._host_q.put(e)
                return
            while not self._stop.is_set():
                try:
                    self._host_q.put(batch, timeout=0.2)
                    break
                except queue.Full:
                    continue

    def start(self) -> "PrefetchLoader":
        if not self._started:
            for t in self._threads:
                t.start()
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        # drain so producer threads blocked on put() can exit
        try:
            while True:
                self._host_q.get_nowait()
        except queue.Empty:
            pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # -- consumer side ------------------------------------------------------
    def _get_host_item(self):
        # don't block forever on an empty queue once a worker has died:
        # surviving workers may be unable to refill it fast enough, and
        # with 0 survivors nothing ever will (ADVICE round-1)
        while True:
            try:
                item = self._host_q.get(timeout=1.0)
                break
            except queue.Empty:
                if not any(t.is_alive() for t in self._threads):
                    raise RuntimeError(
                        "all PrefetchLoader workers have exited"
                        + (
                            " after a sample_fn failure"
                            if self._failed.is_set() else ""
                        )
                    ) from None
        if isinstance(item, Exception):
            raise item
        return item

    def __iter__(self) -> Iterator:
        self.start()
        pending = None  # one-deep device prefetch pipeline
        while True:
            if self.stack > 1:
                item = self.collate(
                    [self._get_host_item() for _ in range(self.stack)]
                )
            else:
                item = self._get_host_item()
            # `device` may be a callable item -> shardings pytree (e.g. the
            # graph-axis feed shards only the PartitionedEdges leaves)
            dst = self.device(item) if callable(self.device) else self.device
            dev = jax.device_put(item, dst)
            for _ in range(self.repeat):
                if pending is not None:
                    yield pending
                pending = dev

    def take(self, n: int):
        it = iter(self)
        return [next(it) for _ in range(n)]
