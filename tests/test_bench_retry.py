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


def test_retry_exception_falls_back_to_first_measurement():
    def run_then_raise():
        state = {"n": 0}

        def run():
            if state["n"] == 0:
                state["n"] += 1
                return 3.0, 7
            raise RuntimeError("executor lost")

        return run

    dt, n, retried = bench._measure_with_retry(run_then_raise(), 0.5, "q")
    assert retried
    assert dt == 3.0 and n == 7  # run 1's valid result, not a FAILURE


def test_retry_clears_corpus_memos_first():
    """The retry must not be served from a memo the first run populated —
    it re-measures under (roughly) the first run's cache state."""
    from exact_spark.artifacts import _ALL_MEMOS, memo_put

    memo: dict = {}
    memo_put(memo, "corpus-x", "expensive")
    assert memo  # warm before the retry

    seen_at_retry = {}

    def run():
        if not seen_at_retry:
            seen_at_retry["memo_len_run1"] = len(memo)
            return 3.0, 7
        seen_at_retry["memo_len_run2"] = len(memo)
        return 0.4, 7

    dt, n, retried = bench._measure_with_retry(run, 0.5, "q")
    assert retried and dt == 0.4
    assert seen_at_retry["memo_len_run1"] == 1
    assert seen_at_retry["memo_len_run2"] == 0  # cleared before retry
