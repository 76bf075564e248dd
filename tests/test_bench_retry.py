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


def test_retry_evicts_only_first_runs_memo_additions():
    """The retry must not be served from a memo entry the FIRST run
    populated — but memos warmed by EARLIER queries must stay intact, or
    a single burst-triggered retry would force every later memo consumer
    cold and manufacture the phantom flags the retry exists to suppress."""
    from exact_spark.artifacts import memo_put

    memo: dict = {}
    memo_put(memo, "warmed-by-earlier-query", "keep me")

    seen = {}

    def run():
        if "run1" not in seen:
            seen["run1"] = True
            memo_put(memo, "built-during-run1", "expensive")
            return 3.0, 7
        seen["run2_keys"] = set(memo)
        return 0.4, 7

    dt, n, retried = bench._measure_with_retry(run, 0.5, "q")
    assert retried and dt == 0.4
    # run 1's addition evicted; the earlier query's warm entry survived
    assert seen["run2_keys"] == {"warmed-by-earlier-query"}


def test_retry_exception_runs_cleanup():
    """A failed retry must still clear the query's cached frames so later
    timings aren't polluted."""
    cleaned = []

    def run_then_raise():
        state = {"n": 0}

        def run():
            if state["n"] == 0:
                state["n"] += 1
                return 3.0, 7
            raise RuntimeError("executor lost")

        return run

    dt, n, retried = bench._measure_with_retry(
        run_then_raise(), 0.5, "q", cleanup=lambda: cleaned.append(True)
    )
    assert retried and dt == 3.0
    assert cleaned == [True]


def test_rows_sign_changes_flags_planted_empty_regression():
    """VERDICT r06 item 3: a query whose result collapses to empty between
    rounds (the semantic-dedup cluster-cap no-op signature) must flag."""
    prev = {"dedup_semantic": 189, "rel_q1": 4, "quiet": 0}
    cur = {"dedup_semantic": 0, "rel_q1": 4, "quiet": 0}
    assert bench._rows_sign_changes(prev, cur) == ["dedup_semantic"]


def test_rows_sign_changes_flags_empty_to_nonzero_too():
    # the r07 semantic FIX is itself a sign change (0 -> 1239) — it must
    # surface in the record, not pass silently
    assert bench._rows_sign_changes({"q": 0}, {"q": 1239}) == ["q"]


def test_rows_sign_changes_ignores_new_and_removed_names():
    # registry growth is not drift; nonzero->nonzero movement is not a
    # SIGN change (the widened _rows_drift gate handles it)
    assert bench._rows_sign_changes({"old": 5}, {"new": 0}) == []
    assert bench._rows_sign_changes({"q": 5}, {"q": 9999}) == []


def test_rows_drift_flags_partial_collapse():
    """VERDICT r07 item 3: the PARTIAL version of the empty-result bug —
    dedup_simhash_pairs quietly collapsing 1292 -> 40 — must flag even
    though neither side is zero (counts are deterministic; any movement
    on an unchanged registry is a regression or an unseeded semantics
    change)."""
    prev = {"dedup_simhash_pairs": 1292, "rel_q1": 4, "quiet": 0}
    cur = {"dedup_simhash_pairs": 40, "rel_q1": 4, "quiet": 0}
    assert bench._rows_drift(prev, cur) == ["dedup_simhash_pairs"]


def test_rows_drift_carves_out_registry_growth():
    assert bench._rows_drift({"old": 5}, {"new": 7}) == []
    assert bench._rows_drift({"q": 5}, {"q": 5}) == []
    # sign changes are a subset of drift
    assert bench._rows_drift({"q": 5}, {"q": 0}) == ["q"]


def test_retry_reinstates_entries_displaced_at_cap():
    """ADVICE r06: a first run whose memo_put lands on a FULL memo
    FIFO-displaces a pre-existing entry; the rollback must bring that
    entry back, or the retry runs COLDER than run 1 and can time slow
    enough to flag a phantom regression."""
    from exact_spark.artifacts import memo_put

    memo: dict = {}
    for i in range(3):
        memo_put(memo, f"warm{i}", f"v{i}", cap=3)  # memo now at cap

    seen = {}

    def run():
        if "run1" not in seen:
            seen["run1"] = True
            memo_put(memo, "built-during-run1", "expensive", cap=3)
            assert "warm0" not in memo  # displaced at cap
            return 3.0, 7
        seen["run2_memo"] = dict(memo)
        return 0.4, 7

    dt, n, retried = bench._measure_with_retry(run, 0.5, "q")
    assert retried and dt == 0.4
    # run 1's addition evicted AND the displaced entry reinstated
    assert seen["run2_memo"] == {"warm0": "v0", "warm1": "v1", "warm2": "v2"}
