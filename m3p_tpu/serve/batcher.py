"""Request micro-batching.

Concurrent callers submit single items; a worker thread coalesces them into
batches of up to ``max_batch`` items (waiting at most ``max_wait_s`` after the
first item arrives) and runs the whole batch through one handler call.  On a
TPU this is the difference between B=1 dispatches that starve the MXU and
full-bucket batches — the serving-side analogue of the training pipeline's
prefetcher.
"""

from __future__ import annotations

import logging
import queue
import threading
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FutureTimeout
from typing import Any, Callable, List, Sequence

logger = logging.getLogger("m3p_tpu")


class QueueFull(RuntimeError):
    """Raised by submit() when max_pending items are already queued —
    backpressure, mapped to HTTP 429 by the server."""


class RequestTimeout(RuntimeError):
    """Raised by __call__ when the WAIT for a result exceeds the timeout —
    mapped to HTTP 503 by the server.  Distinct from a handler-raised
    TimeoutError: on Python >= 3.11 concurrent.futures.TimeoutError is an
    alias of the builtin, so `except TimeoutError` around Future.result
    would also swallow engine-internal timeouts (socket reads, subprocess
    waits) and mislabel real errors as request timeouts."""


class MicroBatcher:
    """Coalesce single-item submissions into batched handler calls.

    ``handler(items) -> results`` must return one result per item, in order.
    A handler exception fails every future in that batch (callers see the
    original exception); the worker keeps serving subsequent batches.
    ``max_pending`` bounds the queue: beyond it, submit() raises `QueueFull`
    instead of letting an overload grow latency without bound.
    """

    def __init__(self, handler: Callable[[List[Any]], Sequence[Any]],
                 max_batch: int = 64, max_wait_s: float = 0.005,
                 name: str = "batcher", max_pending: int = 1024):
        # ValueError, not assert: asserts are stripped under `python -O`,
        # and queue.Queue treats maxsize <= 0 as INFINITE — an unvalidated 0
        # would silently disable the 429 backpressure an operator thinks
        # they configured
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        if max_pending < 1:
            raise ValueError(f"max_pending must be >= 1, got {max_pending}")
        self._handler = handler
        self._max_batch = max_batch
        self._max_wait_s = max_wait_s
        self._max_pending = max_pending
        # the bound lives in the queue itself: put_nowait/Full is atomic, so
        # concurrent submitters can never overshoot it (a check-then-put on
        # qsize() could).  Items already popped into the worker's in-flight
        # batch stop counting, so the total admitted at once is bounded by
        # max_pending + max_batch.
        self._queue: "queue.Queue" = queue.Queue(maxsize=max_pending)
        self._stopped = threading.Event()
        self._thread = threading.Thread(target=self._loop, name=name,
                                        daemon=True)
        self._thread.start()

    def submit(self, item: Any) -> Future:
        if self._stopped.is_set():
            raise RuntimeError("MicroBatcher is stopped")
        fut: Future = Future()
        try:
            self._queue.put_nowait((item, fut))
        except queue.Full:
            raise QueueFull(
                f"{self._max_pending} requests already pending "
                f"(max_pending={self._max_pending})") from None
        return fut

    def __call__(self, item: Any, timeout: float = None) -> Any:
        """Submit and block for the result.

        A wait past ``timeout`` raises `RequestTimeout` and CANCELS the
        still-queued item so the worker never runs abandoned work (a
        cancelled entry would otherwise hold a max_pending slot and burn a
        device pass computing a result nobody reads).  A TimeoutError
        raised BY the handler propagates as itself (see `RequestTimeout`)."""
        fut = self.submit(item)
        try:
            return fut.result(timeout=timeout)
        except FutureTimeout:
            if fut.done():
                # the future completed between the wait timing out and this
                # check.  result() returns a late RESULT instead of
                # discarding it, and re-raises a handler-raised TimeoutError
                # as itself (a real error, not a request timeout)
                return fut.result()
            fut.cancel()    # shed the work if the worker hasn't started it
            raise RequestTimeout(
                f"no result within {timeout}s "
                f"(queue depth {self._queue.qsize()})") from None

    def stop(self, timeout: float = 5.0) -> None:
        self._stopped.set()
        try:
            self._queue.put_nowait(None)  # wake a worker blocked in get()
        except queue.Full:
            pass  # queue non-empty -> the worker isn't blocked; it re-checks
            # _stopped at its next loop iteration
        self._thread.join(timeout=timeout)

    # -- worker ----------------------------------------------------------

    def _collect(self) -> List:
        """Block for the first item, then drain up to max_batch within the
        wait window."""
        first = self._queue.get()
        if first is None:
            return []
        batch = [first]
        while len(batch) < self._max_batch:
            try:
                nxt = self._queue.get(timeout=self._max_wait_s)
            except queue.Empty:
                break
            if nxt is None:
                break
            batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while not self._stopped.is_set():
            batch = self._collect()
            # claim each future (PENDING -> RUNNING): a timed-out caller's
            # cancel() can no longer land after this, so set_result/
            # set_exception below are race-free; already-cancelled entries
            # (abandoned requests) are dropped without running the handler
            batch = [(it, f) for it, f in batch
                     if f.set_running_or_notify_cancel()]
            if not batch:
                continue
            items = [it for it, _ in batch]
            futures = [f for _, f in batch]
            try:
                results = self._handler(items)
                if len(results) != len(items):
                    raise RuntimeError(
                        f"handler returned {len(results)} results for "
                        f"{len(items)} items")
            except Exception as e:  # noqa: BLE001 — fail the batch, keep serving
                logger.exception("micro-batch handler failed")
                for f in futures:
                    f.set_exception(e)
                continue
            for f, r in zip(futures, results):
                f.set_result(r)
        # drain: fail anything still queued after stop
        while True:
            try:
                entry = self._queue.get_nowait()
            except queue.Empty:
                break
            if entry is not None and entry[1].set_running_or_notify_cancel():
                entry[1].set_exception(RuntimeError("MicroBatcher stopped"))
