"""Graceful preemption handling for train loops.

TPU fleet instances are routinely preempted (maintenance events send
SIGTERM with a short grace window). The reference has no story here —
crash → rerun from the last periodic checkpoint, losing up to
ckpt_every steps (SURVEY.md §5: "Failure detection / elastic recovery:
none"). Here a signal sets a flag; the fit loops check it each step,
save a final checkpoint, and drain pending async checkpoint writes
before returning — resume then continues from the preempted step
exactly (the resume path is bit-identical, tests/test_resume.py).
"""

from __future__ import annotations

import signal
import threading


class GracefulStop:
    """A latch the train loops poll once per step.

    ``install()`` registers SIGTERM/SIGINT handlers that set the latch and
    then chain to any previously-installed handler (so external managers
    keep working). Handlers can only be installed from the main thread;
    ``request()`` sets the latch programmatically from anywhere.
    """

    def __init__(self):
        self._event = threading.Event()
        self._prev: dict[int, object] = {}

    @property
    def requested(self) -> bool:
        return self._event.is_set()

    def request(self) -> None:
        self._event.set()

    def install(self, signals=(signal.SIGTERM, signal.SIGINT)):
        """First signal sets the latch and RESTORES the previous handlers,
        so a second signal behaves as before installation (e.g. a second
        Ctrl-C hard-kills instead of waiting for the graceful save)."""
        def handler(signum, frame):
            self._event.set()
            for s, prev in self._prev.items():
                signal.signal(s, prev)

        for s in signals:
            self._prev[s] = signal.getsignal(s)
            signal.signal(s, handler)
        return self
