"""Background device warm-up threads (shared by the short-read and
PacBio cost-model routers).

A COLD device executable must not block the anneal: the caller serves
the batch natively (bit-identical) and hands the same batch to a daemon
thread whose dispatch performs the synchronous XLA compile; once the
thread finishes, the executable is warm and later batches route to the
chip.  A warm-up that raises is retried on later batches (transient
tunnel errors must not pin the whole process to host kernels) up to
GAML_WARMUP_RETRIES extra attempts before the route is disabled for the
process.  Threads are joined at interpreter exit — a daemon thread
killed mid-RPC inside the device client aborts teardown."""
from __future__ import annotations

import atexit
import os
import threading
from typing import Callable, Dict, Tuple

_THREADS: list = []
# key -> True (warm) | Thread (in flight) | ("failed", attempts_so_far)
_STATE: Dict[Tuple, object] = {}


def _join_all() -> None:
    for th in _THREADS:
        if th.is_alive():
            th.join(timeout=120)
    _THREADS.clear()


atexit.register(_join_all)


def _max_attempts() -> int:
    """Total warm attempts allowed per key: 1 + GAML_WARMUP_RETRIES."""
    return 1 + int(os.environ.get("GAML_WARMUP_RETRIES", "3"))


def mark_ready(key: Tuple) -> None:
    """Record ``key``'s executable as warm without a thread — used by
    explicit prewarm paths that compiled it synchronously."""
    _STATE[key] = True


def mark_failed(key: Tuple, attempts: int = 1) -> None:
    """Flag ``key`` as failed-but-retryable (a later device_ready call
    starts a fresh warm attempt)."""
    _STATE[key] = ("failed", attempts)


def register_inflight(key: Tuple, thread) -> None:
    """Attach ``key`` to an externally managed warm thread (e.g. the
    PacBio prewarm ladder) so concurrent device_ready callers route
    native instead of spawning DUPLICATE compiles of the same
    executable — measured: duplicated ladder compiles saturate the
    serialized relay and the cores, inflating early-move latency ~15x.
    No-op if the key is already warm."""
    if _STATE.get(key) is not True:
        if not hasattr(thread, "attempt"):
            thread.attempt = 1
        _STATE[key] = thread


def _start(key: Tuple, warm_fn: Callable[[], None], attempt: int) -> None:
    def run():
        try:
            warm_fn()
        except Exception as e:
            import sys

            _STATE[key] = ("failed", attempt)
            if attempt >= _max_attempts():
                print(f"[warmup] {key}: {type(e).__name__}: {e} — "
                      f"giving up after {attempt} attempts, device route "
                      f"disabled, serving native",
                      file=sys.stderr, flush=True)
            else:
                print(f"[warmup] {key}: {type(e).__name__}: {e} — "
                      f"attempt {attempt}/{_max_attempts()}, will retry "
                      f"on a later batch", file=sys.stderr, flush=True)

    th = threading.Thread(target=run, daemon=True, name="gaml-dev-warmup")
    th.attempt = attempt
    _STATE[key] = th
    _THREADS.append(th)
    th.start()


def device_ready(key: Tuple, warm_fn: Callable[[], None]) -> bool:
    """True once the executable behind ``key`` is warm.  On first call
    (cold), starts a daemon thread running ``warm_fn`` (which should
    dispatch the compile and skip result fetches) and returns False; while
    the thread runs, keeps returning False.  A warm-up that raises is
    retried with the NEXT caller's ``warm_fn`` (bounded, see module doc);
    once the attempt budget is exhausted the key pins to "failed" and the
    route stays native instead of every later batch failing on the device
    and falling back."""
    st = _STATE.get(key)
    if st is True:
        return True
    if isinstance(st, tuple):  # ("failed", attempts)
        if st[1] >= _max_attempts():
            return False
        _start(key, warm_fn, st[1] + 1)
        return False
    if st is not None:  # a Thread
        if st.is_alive():
            return False
        cur = _STATE.get(key)
        if isinstance(cur, tuple):  # run() flagged failure as it exited
            return False
        _STATE[key] = True
        return True
    _start(key, warm_fn, 1)
    return False
