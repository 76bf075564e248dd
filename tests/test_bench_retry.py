"""The bench burst-retry policy (VERDICT r05 item 3).

A first measurement over 2x the committed BASELINE envelope triggers
exactly one re-run and the min is recorded, so a transient host burst on
a sub-second query does not flag a phantom regression — while a planted
real slowdown (slow on BOTH runs) still breaches the envelope.
"""

from __future__ import annotations

import bench


def _runner(times):
    """Fake query runner yielding the given durations in order."""
    it = iter(times)

    def run():
        return next(it), 7

    return run


def test_burst_is_absorbed_by_retry():
    # first run 3.0s (host burst), retry 0.4s, envelope 0.5s -> min recorded,
    # no longer over 2x.
    dt, n, retried = bench._measure_with_retry(_runner([3.0, 0.4]), 0.5, "q")
    assert retried
    assert dt == 0.4
    assert n == 7
    assert dt <= 2.0 * 0.5


def test_planted_real_regression_still_flags():
    # a deliberately slowed query is slow on both runs: the recorded min
    # still breaches the 2x gate.
    dt, n, retried = bench._measure_with_retry(_runner([3.0, 2.9]), 0.5, "q")
    assert retried
    assert dt == 2.9
    assert dt > 2.0 * 0.5


def test_clean_run_never_retries():
    run = _runner([0.4])  # a second call would raise StopIteration
    dt, n, retried = bench._measure_with_retry(run, 0.5, "q")
    assert not retried
    assert dt == 0.4


def test_no_envelope_never_retries():
    dt, n, retried = bench._measure_with_retry(_runner([99.0]), None, "q")
    assert not retried
    assert dt == 99.0
