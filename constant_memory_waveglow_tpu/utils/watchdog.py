"""Hang watchdog — failure detection for wedged device runtimes.

A remote-TPU runtime can wedge mid-step (a lost RPC leaves the client
blocked forever inside a device->host fetch with no exception ever
raised).  The reference's Lightning stack has no answer to this either;
on a preemptible production pod the standard recipe is fail-fast +
supervised restart, which this repo's auto-resume (``train.py``
re-launches from the latest checkpoint by default) makes cheap.

``HangWatchdog`` arms after the first heartbeat (so the initial multi-
minute XLA compile never counts) and, if no heartbeat arrives within
``timeout`` seconds, dumps every thread's Python stack to stderr and
hard-exits with ``EXIT_CODE`` so a supervisor can distinguish a hang from
a crash.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time

EXIT_CODE = 42  # distinguishable "wedged, please restart me" exit status


class HangWatchdog:
    def __init__(self, timeout: float, on_hang=None, poll: float = 1.0):
        self.timeout = float(timeout)
        self._on_hang = on_hang or self._default_on_hang
        self._poll = poll
        self._last = None  # not armed until the first beat()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="hang-watchdog")

    def start(self):
        self._thread.start()
        return self

    def beat(self):
        """Mark liveness; the first call arms the watchdog."""
        self._last = time.monotonic()

    def stop(self):
        self._stop.set()

    # ------------------------------------------------------------------
    def _run(self):
        while not self._stop.wait(self._poll):
            last = self._last
            if last is not None and time.monotonic() - last > self.timeout:
                self._on_hang()
                return

    def _default_on_hang(self):
        sys.stderr.write(
            f"\n[hang-watchdog] no step heartbeat for >{self.timeout:.0f}s "
            f"— device runtime presumed wedged; dumping stacks and exiting "
            f"{EXIT_CODE} (auto-resume restarts from the last checkpoint)\n")
        sys.stderr.flush()
        faulthandler.dump_traceback(all_threads=True)
        sys.stderr.flush()
        os._exit(EXIT_CODE)
