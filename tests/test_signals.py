"""Graceful-drain signal handling (selfplay.cpp:24-31 semantics)."""

import os
import signal

from katago_tpu.utils.signals import GracefulShutdown


def test_first_signal_drains_second_aborts():
    msgs = []
    with GracefulShutdown(msgs.append) as stop:
        assert not stop.requested
        os.kill(os.getpid(), signal.SIGTERM)
        assert stop.requested
        assert any("drain" in m for m in msgs)
        try:
            os.kill(os.getpid(), signal.SIGINT)
            raise AssertionError("expected KeyboardInterrupt")
        except KeyboardInterrupt:
            pass
    # handlers restored on exit
    assert signal.getsignal(signal.SIGTERM) is not None


def test_handlers_restored():
    prev_int = signal.getsignal(signal.SIGINT)
    prev_term = signal.getsignal(signal.SIGTERM)
    with GracefulShutdown():
        pass
    assert signal.getsignal(signal.SIGINT) is prev_int
    assert signal.getsignal(signal.SIGTERM) is prev_term
