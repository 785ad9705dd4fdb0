"""Background-thread batch prefetch (double-buffering).

The reference pipeline's only concurrency is ``tf.data`` prefetch
(reference bin/factorize_csv.py:111-112); the rebuild's fit loop was fully
synchronous — on a 1-core host the COO/CSR batch assembly serialized with
the device step (r2: 3.2 s/epoch steady state for 100k sparse rows, ~10x
off the dense path). This module overlaps them: a daemon thread assembles
(and optionally device_puts) batch N+1 while the device runs step N.

JAX note: ``jax.device_put`` / ``jnp.asarray`` are thread-safe; moving the
H2D transfer into the worker also overlaps the tunnel latency with compute.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Optional

__all__ = ["prefetch_batches"]

_SENTINEL = object()


def prefetch_batches(iterable: Iterable, size: int = 2,
                     transform: Optional[Callable] = None):
    """Yield items from ``iterable``, produced ``size`` ahead in a daemon
    thread; ``transform`` (e.g. the host->device placement) runs in the
    worker. ``size=0`` disables threading (synchronous passthrough).

    Worker exceptions re-raise at the consuming ``next()`` call; an
    abandoned generator unblocks and joins the worker on close/GC.
    """
    if size <= 0:
        for item in iterable:
            yield transform(item) if transform is not None else item
        return

    q: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()

    def put_or_stop(item) -> bool:
        """Bounded put that gives up when the consumer is gone; True when
        the item was enqueued (every put must go through here — an
        unconditional q.put would block a worker forever if the consumer
        abandoned the generator with the queue full)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def work():
        try:
            for item in iterable:
                if transform is not None:
                    item = transform(item)
                if not put_or_stop(item):
                    return
            put_or_stop(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — propagate to consumer
            put_or_stop(e)

    worker = threading.Thread(target=work, daemon=True)
    worker.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        worker.join(timeout=5.0)
