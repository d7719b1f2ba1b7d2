"""Readers-writer lock for per-index request concurrency.

The reference serves with N http-client threads over a database pool
(src/manager.h:155-163, opts.h num_http_clients) with Xapian's
concurrent-readers / single-writer discipline per shard. The REST layer
here mirrors that: searches take the shared side (many in flight per
index), writes take the exclusive side (one writer, and no reader sees a
segment list mid-swap). Writer-preference: once a writer waits, new
readers queue behind it so bulk loads cannot be starved by a search
stream.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager


class RWLock:
    __slots__ = ("_cond", "_readers", "_writer", "_writers_waiting")

    def __init__(self):
        self._cond = threading.Condition()
        self._readers = 0
        self._writer = False
        self._writers_waiting = 0

    def acquire_read(self):
        with self._cond:
            while self._writer or self._writers_waiting:
                self._cond.wait()
            self._readers += 1

    def release_read(self):
        with self._cond:
            self._readers -= 1
            if self._readers == 0:
                self._cond.notify_all()

    def try_acquire_read(self) -> bool:
        """Non-blocking shared acquire - the serving fast path runs small
        host-scored queries inline on the event loop and must never wait
        behind a writer there (it falls back to the worker pool instead)."""
        with self._cond:
            if self._writer or self._writers_waiting:
                return False
            self._readers += 1
            return True

    def acquire_write(self):
        with self._cond:
            self._writers_waiting += 1
            try:
                while self._writer or self._readers:
                    self._cond.wait()
            finally:
                self._writers_waiting -= 1
            self._writer = True

    def release_write(self):
        with self._cond:
            self._writer = False
            self._cond.notify_all()

    @contextmanager
    def read(self):
        self.acquire_read()
        try:
            yield
        finally:
            self.release_read()

    @contextmanager
    def write(self):
        self.acquire_write()
        try:
            yield
        finally:
            self.release_write()
