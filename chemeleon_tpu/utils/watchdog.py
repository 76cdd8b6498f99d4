"""Hang watchdog: abort a wedged process so a supervisor can resume it.

The single-chip TPU behind the axon tunnel occasionally dies mid-step
(observed: `jax.errors.JaxRuntimeError: UNAVAILABLE: TPU worker process
crashed or restarted`, and — worse — host calls that block forever inside a
device op). A blocked C call cannot be interrupted from Python, so the only
reliable recovery is process-level: a daemon thread watches a heartbeat the
training loop refreshes every step, and if no progress happens within the
timeout it prints a diagnostic and `os._exit(EXIT_CODE)`. Checkpoint/resume
is already exact (orbax best/last + optimizer/scheduler state, trainer
tests), so a supervisor — `chemeleon_tpu.scripts.train_resilient` — can
relaunch with `resume_from=<last>` and lose at most one checkpoint interval.

The reference delegates all fault tolerance to Lightning (none configured,
SURVEY §5 "failure detection: none"); this is the TPU-native equivalent of
an elastic-training restart policy.
"""

from __future__ import annotations

import os
import sys
import threading
import time

# distinct from Python's generic 1 so supervisors can tell "device wedged,
# resume me" from real errors
EXIT_CODE = 17


class HangWatchdog:
    """Daemon thread that kills the process if `beat()` goes quiet.

    >>> wd = HangWatchdog(timeout_s=900, where="train loop")
    >>> wd.beat()   # call at every unit of progress
    >>> wd.stop()   # when the guarded section ends
    """

    def __init__(self, timeout_s: float, where: str = ""):
        self.timeout_s = float(timeout_s)
        self.where = where
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._watch, daemon=True)
        self._thread.start()

    def beat(self) -> None:
        self._last = time.monotonic()

    def stop(self) -> None:
        self._stop.set()

    # context-manager sugar: `with HangWatchdog(900) as wd: ... wd.beat()`
    def __enter__(self) -> "HangWatchdog":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def _watch(self) -> None:
        poll = max(0.05, min(self.timeout_s / 4.0, 30.0))
        while not self._stop.wait(poll):
            quiet = time.monotonic() - self._last
            if quiet > self.timeout_s:
                print(
                    f"[watchdog] no progress for {quiet:.0f}s "
                    f"(timeout {self.timeout_s:.0f}s) in {self.where or '?'}"
                    f" — device presumed wedged; exiting {EXIT_CODE} for "
                    f"supervisor restart+resume",
                    file=sys.stderr, flush=True)
                os._exit(EXIT_CODE)
