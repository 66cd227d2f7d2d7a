"""Preemption-safe training shutdown.

The reference has no failure handling — recovery is a manual restart from
the last epoch checkpoint (SURVEY.md section 5; train_sde.py:117-120). On
preemptible TPU VMs that can lose up to ``chkpt_interval`` epochs of work,
so the rebuild adds a graceful-shutdown path: SIGTERM/SIGINT (the signals
Cloud TPU / Borg-style preemption delivers) set a flag, the epoch loop
notices at the next step boundary, writes a final checkpoint, and exits
cleanly. Resuming with ``training.restore_path`` continues from that step's
epoch.
"""

from __future__ import annotations

import logging
import signal

logger = logging.getLogger(__name__)


class GracefulShutdown:
    """Context manager that converts SIGTERM/SIGINT into a poll-able flag.

    The first signal requests a graceful stop; a second SIGINT re-raises
    KeyboardInterrupt so an interactive user can still hard-kill.
    """

    def __init__(self, signals=(signal.SIGTERM, signal.SIGINT)):
        self._signals = signals
        self._previous = {}
        self.requested = False

    def _handle(self, signum, frame):
        if self.requested and signum == signal.SIGINT:
            raise KeyboardInterrupt
        logger.warning(
            "received %s: finishing the current step and checkpointing",
            signal.Signals(signum).name,
        )
        self.requested = True

    def install(self) -> "GracefulShutdown":
        for s in self._signals:
            try:
                self._previous[s] = signal.signal(s, self._handle)
            except ValueError:  # not on the main thread (tests, notebooks)
                pass
        return self

    def uninstall(self) -> None:
        for s, prev in self._previous.items():
            signal.signal(s, prev)
        self._previous = {}

    def __enter__(self):
        return self.install()

    def __exit__(self, *exc):
        self.uninstall()
        return False
