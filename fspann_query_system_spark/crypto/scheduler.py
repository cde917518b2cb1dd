"""St4: background re-encryption scheduler (reference
``BackgroundReencryptionScheduler.java:83-95`` — fixed-rate task that
drains the touched set and migrates stale rows).

Driver-side thread: Spark jobs submit fine from any driver thread; the
task body is the same J4 plan as the synchronous path.  ``run_once`` is
exposed separately so deployments that prefer an external cron /
Structured Streaming ``availableNow`` trigger can call the identical
body."""

from __future__ import annotations

import threading


class BackgroundReencryptionScheduler:
    def __init__(self, task, interval_sec: float = 600.0):
        """task: zero-arg callable performing one selective re-encryption
        pass (e.g. ``system.rotate_and_reencrypt_touched``)."""
        self.task = task
        self.interval_sec = interval_sec
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.runs = 0
        self.last_result = None

    def run_once(self):
        self.last_result = self.task()
        self.runs += 1
        return self.last_result

    def start(self) -> None:
        if self._thread is not None:
            raise RuntimeError("already started")
        self._stop.clear()          # allow restart after stop()

        def loop():
            while not self._stop.wait(self.interval_sec):
                self.run_once()

        self._thread = threading.Thread(target=loop, daemon=True,
                                        name="reenc-scheduler")
        self._thread.start()

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)
            self._thread = None
