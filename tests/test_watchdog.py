"""Hang watchdog — wedged-runtime failure detection (train.py --hang-timeout)."""

import threading
import time

from constant_memory_waveglow_tpu.utils.watchdog import HangWatchdog


def test_fires_only_after_arming_and_timeout():
    fired = threading.Event()
    wd = HangWatchdog(0.3, on_hang=fired.set, poll=0.05).start()
    # not armed: no beat yet, must never fire
    time.sleep(0.6)
    assert not fired.is_set()
    wd.beat()
    time.sleep(0.15)
    assert not fired.is_set()  # within budget
    wd.beat()  # heartbeat resets the deadline
    time.sleep(0.15)
    assert not fired.is_set()
    assert fired.wait(2.0)  # silence past the timeout -> fires
    wd.stop()


def test_stop_prevents_firing():
    fired = threading.Event()
    wd = HangWatchdog(0.2, on_hang=fired.set, poll=0.05).start()
    wd.beat()
    wd.stop()
    time.sleep(0.5)
    assert not fired.is_set()
