"""Executor hang detector.

Counterpart of the reference's `HangDetector`
(`pyexecutor/hang_detector.py:10-70`, wired at py_executor.py:404,1477): a
watchdog thread watches the executor loop's heartbeat; if the loop stops
making progress while requests are in flight, it dumps every thread's stack
to the log (the reference additionally aborts MPI — single-controller JAX
has no world to abort, so we surface the dump and error the requests).
"""

from __future__ import annotations

import sys
import threading
import time
import traceback
from typing import Callable, Optional

from tensorrt_llm_tpu.utils import logger


def dump_all_stacks() -> str:
    out = []
    for tid, frame in sys._current_frames().items():
        name = next((t.name for t in threading.enumerate()
                     if t.ident == tid), str(tid))
        out.append(f"--- thread {name} ({tid}) ---")
        out.extend(traceback.format_stack(frame))
    return "\n".join(out)


class HangDetector:
    def __init__(self, timeout: float = 300.0,
                 on_hang: Optional[Callable[[str], None]] = None):
        self.timeout = timeout
        self.on_hang = on_hang
        self._beat = time.monotonic()
        self._busy = False
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.fired = False

    def start(self):
        if self.timeout <= 0 or self._thread is not None:
            return
        self._thread = threading.Thread(target=self._watch, daemon=True,
                                        name="tllm-tpu-watchdog")
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)
            self._thread = None

    def heartbeat(self, busy: bool):
        """Called by the executor loop every iteration. busy=False (idle,
        no requests) pauses the countdown."""
        self._beat = time.monotonic()
        self._busy = busy

    def _watch(self):
        while not self._stop.wait(min(self.timeout / 4, 5.0)):
            if not self._busy:
                continue
            stale = time.monotonic() - self._beat
            if stale > self.timeout:
                self.fired = True
                dump = dump_all_stacks()
                logger.error(
                    "executor loop made no progress for %.0fs with requests "
                    "in flight — thread dump:\n%s", stale, dump)
                if self.on_hang is not None:
                    try:
                        self.on_hang(dump)
                    except Exception:  # noqa: BLE001
                        pass
                self._beat = time.monotonic()  # rate-limit repeat dumps
