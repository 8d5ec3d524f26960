"""Asynchronous host-side input pipeline.

At ~1 ms per fused train step the chip consumes batches faster than a
synchronous host loop can pack them, so the host data path (CMVN,
ragged-batch packing, target encoding — the C++/OpenMP runtime in
``asg_host.cpp``, which releases the GIL for the duration of each ctypes
call — plus the host->device transfer) must overlap device compute.

``BatchPrefetcher`` runs a user ``prepare_fn`` over an item iterator in a
background thread with a bounded queue: while the training loop blocks
inside ``train_step`` (device execution), the worker packs and
``device_put``s the next ``depth`` batches.  This is the TPU-framework
analogue of a native dataloader: the loop-heavy work is C++ (GIL-free),
the orchestration is one thread and one queue.

The reference has no input pipeline at all (it is a loss library); this
sits on the framework side of the capability surface.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

__all__ = ["BatchPrefetcher", "device_prefetch"]

_DONE = object()


class BatchPrefetcher:
    """Iterate ``prepare_fn(item)`` for each item, prepared ahead of time.

    Args:
      items: the source iterable (e.g. lists of raw utterances).
      prepare_fn: runs IN THE WORKER THREAD; typically cmvn + pack_frames
        + encode_targets + jax.device_put.  Exceptions propagate to the
        consumer at the matching ``__next__`` call.
      depth: max prepared batches in flight (bounded queue).

    Use as a context manager or call ``close()`` to stop early; the
    worker exits promptly once the queue drains.
    """

    def __init__(
        self,
        items: Iterable,
        prepare_fn: Callable,
        depth: int = 2,
    ):
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._exhausted = False
        self._prepare = prepare_fn
        self._worker = threading.Thread(
            target=self._run, args=(iter(items),), daemon=True
        )
        self._worker.start()

    def _put_responsive(self, out):
        # bounded put that stays responsive to close(); a plain put() on a
        # full queue would deadlock against a consumer that stopped reading
        while not self._stop.is_set():
            try:
                self._q.put(out, timeout=0.1)
                break
            except queue.Full:
                continue

    def _run(self, it: Iterator):
        try:
            for item in it:
                if self._stop.is_set():
                    break
                self._put_responsive((self._prepare(item), None))
        except BaseException as exc:  # re-raised in the consumer
            self._put_responsive((None, exc))
            return
        self._put_responsive(_DONE)

    def __iter__(self):
        return self

    def __next__(self):
        if self._stop.is_set() or self._exhausted:
            raise StopIteration
        # timed get that re-checks _stop: a close() from another thread
        # sets _stop and enqueues nothing (the worker's _put_responsive
        # no-ops once stopped), so an unbounded get() here would block
        # that consumer forever
        while True:
            try:
                got = self._q.get(timeout=0.1)
                break
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration from None
        if got is _DONE:
            # keep raising on any further call (iterator protocol) —
            # there is exactly one _DONE sentinel in the queue
            self._exhausted = True
            raise StopIteration
        batch, exc = got
        if exc is not None:
            self.close()
            raise exc
        return batch

    def close(self):
        """Stop the worker and drop queued batches."""
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._worker.join(timeout=5.0)

    def __enter__(self):
        return self

    def __exit__(self, *exc_info):
        self.close()
        return False


def device_prefetch(
    items: Iterable,
    prepare_fn: Callable,
    depth: int = 2,
    sharding: Optional[object] = None,
):
    """Convenience wrapper: prepare on the host, then ``jax.device_put``
    (optionally with a ``NamedSharding``) still inside the worker thread,
    so transfers overlap the device step too.  ``prepare_fn`` must return
    a pytree of numpy arrays."""
    import jax

    def prepare_and_put(item):
        host = prepare_fn(item)
        if sharding is None:
            return jax.device_put(host)
        return jax.device_put(host, sharding)

    return BatchPrefetcher(items, prepare_and_put, depth=depth)
