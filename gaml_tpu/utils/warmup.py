"""Background device warm-up threads (shared by the short-read and
PacBio cost-model routers).

A COLD device executable must not block the anneal: the caller serves
the batch natively (bit-identical) and hands the same batch to a daemon
thread whose dispatch performs the synchronous XLA compile; once the
thread finishes, the executable is warm and later batches route to the
chip.  Threads are joined at interpreter exit — a daemon thread killed
mid-RPC inside the device client aborts teardown."""
from __future__ import annotations

import atexit
import threading
from typing import Callable, Dict, Tuple

_THREADS: list = []
_STATE: Dict[Tuple, object] = {}  # key -> Thread (in flight) or True


def _join_all() -> None:
    for th in _THREADS:
        if th.is_alive():
            th.join(timeout=120)
    _THREADS.clear()


atexit.register(_join_all)


def mark_ready(key: Tuple) -> None:
    """Record ``key``'s executable as warm without a thread — used by
    explicit prewarm paths that compiled it synchronously."""
    _STATE[key] = True


def device_ready(key: Tuple, warm_fn: Callable[[], None]) -> bool:
    """True once the executable behind ``key`` is warm.  On first call
    (cold), starts a daemon thread running ``warm_fn`` (which should
    dispatch the compile and skip result fetches) and returns False; while
    the thread runs, keeps returning False.  A warm-up that raises pins
    the key to "failed" (logged once): the route stays native instead of
    every later batch failing on the device and falling back."""
    st = _STATE.get(key)
    if st is True:
        return True
    if st == "failed":
        return False
    if st is not None:
        if st.is_alive():
            return False
        if _STATE.get(key) == "failed":  # run() flagged it as it exited
            return False
        _STATE[key] = True
        return True

    def run():
        try:
            warm_fn()
        except Exception as e:
            import sys

            _STATE[key] = "failed"
            print(f"[warmup] {key}: {type(e).__name__}: {e} — "
                  f"device route disabled, serving native",
                  file=sys.stderr, flush=True)

    th = threading.Thread(target=run, daemon=True, name="gaml-dev-warmup")
    _STATE[key] = th
    _THREADS.append(th)
    th.start()
    return False
