"""Per-key debounced task scheduling (autocommit / fsync committers).

Reference parity target: src/debouncer.h + the committer/fsyncher
instances (src/database/handler.h:395-401, defaults opts.h:110-118):
every write arms a per-key timer; further writes within the debounce
window push it out, but a force timeout caps the total delay so a busy
key still commits periodically. One background thread serves all keys
(the reference uses opts.num_committers=1 by default too).
"""

from __future__ import annotations

import threading
import time
from typing import Callable, Optional


class Debouncer:
    def __init__(self, callback: Callable[[object], None],
                 debounce_s: float = 1.0, max_force_s: float = 3.0,
                 name: str = "committer"):
        self.callback = callback
        self.debounce_s = debounce_s
        self.max_force_s = max_force_s
        self._lock = threading.Lock()
        self._due: dict = {}        # key -> (fire_at, armed_at)
        self._wake = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name=name)
        self._thread.start()

    def trigger(self, key) -> None:
        """Arm/extend the key's timer (≙ debouncer::debounce)."""
        now = time.monotonic()
        with self._lock:
            fire, armed = self._due.get(key, (None, now))
            fire = min(now + self.debounce_s, armed + self.max_force_s)
            self._due[key] = (fire, armed)
        self._wake.set()

    def flush(self, key=None) -> None:
        """Run pending task(s) now (shutdown / explicit commit path)."""
        with self._lock:
            keys = [key] if key is not None and key in self._due \
                else (list(self._due) if key is None else [])
            for k in keys:
                self._due.pop(k, None)
        for k in keys:
            self._safe_call(k)

    def pending(self) -> int:
        with self._lock:
            return len(self._due)

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join(5)
        self.flush()

    def _safe_call(self, key) -> None:
        try:
            self.callback(key)
        except Exception:    # a failing commit must not kill the committer
            pass

    def _run(self) -> None:
        while not self._stop:
            now = time.monotonic()
            ready = []
            nxt = None
            with self._lock:
                for k, (fire, _armed) in list(self._due.items()):
                    if fire <= now:
                        ready.append(k)
                        del self._due[k]
                    elif nxt is None or fire < nxt:
                        nxt = fire
            for k in ready:
                self._safe_call(k)
            timeout = max(nxt - time.monotonic(), 0.01) if nxt is not None \
                else None
            self._wake.wait(timeout=timeout)
            self._wake.clear()
