"""Deadline-bounded backend readiness probe.

The tunneled-TPU backend has two failure modes (NOTES.md "Axon tunnel gotchas"):
a fast RuntimeError("Unavailable") at backend init, and an uninterruptible
futex-wait HANG when the chip is claimed by another process or the tunnel is
wedged.  The hang cannot be interrupted in-process, so the first device op runs
in a daemon thread and the caller's thread enforces a wall-clock deadline;
errors get bounded retries with backoff inside the same deadline.

Entry points that must never hang (bench.py, the train/test/predict CLIs) call
``backend_ready()`` before their first real device op and turn a False result
into a fast, explicit exit instead of an indefinite block.
"""

from __future__ import annotations

import threading
import time
from typing import Tuple


def backend_ready(
    deadline_s: float = 300.0, retries: int = 3, backoff_s: float = 20.0
) -> Tuple[bool, str]:
    """Probe the default backend with a tiny device op. Returns (ok, reason).

    On failure the caller should exit promptly — a hung probe thread is a
    daemon and must not be awaited (use sys.exit / os._exit, not join).
    """
    import jax

    state = {"ok": False, "err": None, "attempts": 0}
    done = threading.Event()

    def probe():
        t_end = time.monotonic() + deadline_s
        for attempt in range(retries):
            state["attempts"] = attempt + 1
            try:
                x = jax.numpy.zeros(()) + 1.0
                jax.block_until_ready(x)
                state["ok"] = True
                break
            except Exception as e:  # noqa: BLE001 — any init error is retryable
                state["err"] = f"{type(e).__name__}: {e}"
                if time.monotonic() + backoff_s > t_end or attempt == retries - 1:
                    break
                time.sleep(backoff_s)
        done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(deadline_s):
        return False, (
            f"backend init hang (> {deadline_s:.0f}s; likely wedged tunnel or "
            "chip claimed by another process)"
        )
    if not state["ok"]:
        return False, (
            f"backend init failed after {state['attempts']} attempt(s): {state['err']}"
        )
    return True, ""


# XLA/infra status markers that mean "the device backend failed", as opposed to
# a bug in the program: tunnel drop, chip claim lost, remote-compile transport
# death.  Deliberately does NOT include generic XlaRuntimeError (a first-step
# compile error is a program bug and must surface as one).
_DEVICE_FAILURE_MARKERS = (
    "UNAVAILABLE",
    "INTERNAL:",
    "DEADLINE_EXCEEDED",
    "ABORTED",
    "DATA_LOSS",
    "Socket closed",
    "Connection reset",
    "failed to connect",
)


def is_device_failure(exc: BaseException) -> bool:
    """True when an exception looks like backend/tunnel infrastructure failure
    (retryable by restarting the process and auto-resuming from the last
    checkpoint) rather than a program error."""
    s = f"{type(exc).__name__}: {exc}"
    return any(m in s for m in _DEVICE_FAILURE_MARKERS)
