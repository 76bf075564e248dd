"""Per-corpus materialized artifacts.

A production engine builds expensive derived structures ONCE per corpus
version and serves them for months: the canonical job table, the kNN
graph, duplicate-group components, staged stream-replay sources. This
module holds the shared mechanics: a content fingerprint of the source
parquet (file names + sizes + mtimes — cheap, no data read), a
/tmp-scoped artifact directory keyed by that fingerprint, and a
race-safe build protocol (build into a staging dir, atomic rename, the
loser of a concurrent race discards its copy). On a cluster the same
protocol targets a shared object-store prefix instead of tempfile.

Consumers re-read the artifact as plain parquet, so Catalyst still gets
column pruning and predicate pushdown on every serve-side read.

Growth policy: artifact dirs live under ``tempfile.gettempdir()`` keyed
by corpus fingerprint. A re-fingerprinted corpus (new data at the same
path) simply abandons the old dir — this process never deletes published
artifacts (readers may hold them), so disk usage is bounded by the
number of corpus VERSIONS seen between tmp-dir cleanups, not by query
count; the host's tmp reaper (or an object-store lifecycle rule on a
cluster) reclaims abandoned fingerprints. Driver-side in-memory memos of
per-corpus derived state use :func:`memo_put`, which FIFO-evicts beyond
``_MEMO_CAP`` corpora so a long-lived shared driver cannot grow them
monotonically.
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import shutil
import tempfile
import uuid
from collections.abc import Callable


_MEMO_CAP = 32  # corpora simultaneously warm per driver process
# Every dict that ever went through memo_put. Intentionally strong refs:
# product memos are module-level and immortal anyway; the id-set makes
# the per-put membership check O(1).
_ALL_MEMOS: list[dict] = []
_ALL_MEMO_IDS: set[int] = set()


def memo_put(memo: dict, key, value, cap: int = _MEMO_CAP):
    """Insert into a process-lifetime, corpus-keyed memo dict with FIFO
    eviction at ``cap`` entries. Every value is rebuildable from its
    corpus (the memo is a warm cache, not state), so evicting the oldest
    corpus is always safe; without a bound a long-lived shared driver
    serving many corpus versions grows these dicts monotonically."""
    if id(memo) not in _ALL_MEMO_IDS:
        _ALL_MEMO_IDS.add(id(memo))
        _ALL_MEMOS.append(memo)
    if key not in memo and len(memo) >= cap:
        memo.pop(next(iter(memo)))
    memo[key] = value
    return value


def snapshot_corpus_memos() -> list[dict]:
    """Shallow key->value copies of every memo_put-tracked memo,
    positionally aligned with the (append-only) internal registry — pair
    with :func:`evict_new_memo_entries` to roll memo state back to this
    point. Copying VALUES (not just key sets) lets the rollback also
    reinstate entries a run's memo_put FIFO-displaced at cap, so a retry
    on a near-cap driver is never COLDER than the first run was."""
    return [dict(m) for m in _ALL_MEMOS]


def evict_new_memo_entries(snapshot: list[dict]) -> int:
    """Restore every memo to exactly its ``snapshot`` state (drop entries
    added since, reinstate entries displaced or overwritten since; memos
    created after the snapshot are emptied), returning how many were
    dropped.

    Benchmarks use the snapshot/evict pair to re-measure a query under
    the cache state its FIRST measurement saw: a retry served from a memo
    that first run populated would record a structurally cheaper
    computation (absorbing a real regression in a memoized builder).
    Scoping the rollback to the first run's OWN changes keeps memos
    warmed by earlier queries intact — a global clear would force every
    later memo consumer cold, manufacturing the phantom over-2x flags the
    retry exists to suppress. Disk artifacts (materialize) are
    intentionally left warm — they were warm for the first run too."""
    n = 0
    for i, m in enumerate(_ALL_MEMOS):
        want = snapshot[i] if i < len(snapshot) else {}
        n += sum(1 for k in m if k not in want)
        # Rebuild in snapshot ITERATION order, not by patching in place:
        # reinstating a displaced key by assignment would append it, so a
        # later at-cap memo_put could FIFO-evict a different "oldest" entry
        # than the first run's would have — the retry must see identical
        # cache BEHAVIOR, not just identical contents.
        m.clear()
        m.update(want)
    return n


def source_fingerprint(source: str | pathlib.Path) -> str:
    """Cheap content fingerprint of a parquet file/dir: relative names,
    sizes, and mtimes of every file under it."""
    src = pathlib.Path(source).resolve()
    files = sorted(src.rglob("*")) if src.is_dir() else [src]
    parts = [
        f"{p.relative_to(src.parent)}:{p.stat().st_size}:{p.stat().st_mtime_ns}"
        for p in files
        if p.is_file()
    ]
    return hashlib.md5((str(src) + "|" + "|".join(parts)).encode()).hexdigest()[:12]


def builder_salt(*query_names: str, helpers: tuple = ()) -> str:
    """Short digest of the registered builder spec(s) behind an artifact,
    folded into the artifact tag so a BUILDER CODE change re-fingerprints
    the artifact automatically (ADVICE r08: keying only on the corpus
    fingerprint lets a warm artifact silently serve a stale pair table
    after the builder is edited — the consumers' content-equality pins
    only catch that in an environment where the stale artifact survives
    into a test run). The digest covers BOTH the registered oracle SQL
    (which interpolates every semantic parameter: thresholds, band
    counts, hash families) AND the Spark builder's function source — a
    Spark-side-only change (e.g. the gram-hash keying, which the oracle
    deliberately spells differently) must also re-fingerprint, and the
    SQL alone cannot see it. Registered fns are often thin wrappers, so
    call sites pass the content-bearing helper functions via ``helpers``
    and their sources join the digest; helpers not passed are not
    transitively digested (the content-equality pins are the backstop
    for that residual class)."""
    import inspect

    from exact_spark.registry import REGISTRY

    parts = []
    for q in query_names:
        spec = REGISTRY[q]
        parts.append(spec.sql or "")
        parts.append(inspect.getsource(spec.fn))
    for h in helpers:
        parts.append(inspect.getsource(h))
    return hashlib.md5("||".join(parts).encode()).hexdigest()[:8]


def materialize(
    source: str | pathlib.Path,
    tag: str,
    build: Callable[[str], None],
) -> str:
    """Return the path of the ``tag`` artifact derived from ``source``,
    building it once per source fingerprint.

    ``build(staging_path)`` must write a parquet dataset (with _SUCCESS)
    at ``staging_path``; it runs only on a cache miss. Concurrent
    builders race safely: both build, one rename wins, the loser's
    staging dir is discarded.
    """
    fp = source_fingerprint(source)
    base = pathlib.Path(tempfile.gettempdir()) / f"exact_spark_{tag}_{fp}"
    if (base / "_SUCCESS").exists():
        return str(base)
    staging = base.with_name(base.name + "." + uuid.uuid4().hex[:8] + ".tmp")
    build(str(staging))
    # Publication order matters: a COMPLETED artifact (base/_SUCCESS) is
    # never deleted — a concurrent loser discards its own staging instead
    # (deleting the winner's copy would break a third consumer mid-read).
    # Only an INCOMPLETE leftover (no _SUCCESS: a crashed past build) is
    # cleared before the rename, and a rename collision re-checks who won.
    if (base / "_SUCCESS").exists():  # concurrent builder won the race
        shutil.rmtree(staging, ignore_errors=True)
        return str(base)
    if base.exists():  # leftover with no _SUCCESS observed (crashed build?)
        # Never rmtree `base` in place: between the _SUCCESS probe above
        # and a delete, a concurrent builder's atomic rename could publish
        # a COMPLETED artifact there. Rename it aside first — if the moved
        # dir turns out to be complete, it was a fresh winner: reinstate it
        # and discard our staging copy instead.
        stale = base.with_name(base.name + "." + uuid.uuid4().hex[:8] + ".stale")
        try:
            os.rename(base, stale)
        except OSError:
            pass  # vanished or re-owned concurrently; the rename below decides
        else:
            if (stale / "_SUCCESS").exists():
                try:
                    os.rename(stale, base)
                    shutil.rmtree(staging, ignore_errors=True)
                    return str(base)
                except OSError:
                    pass  # base reoccupied by yet another winner
            shutil.rmtree(stale, ignore_errors=True)
    try:
        os.rename(staging, base)
    except OSError:
        if (base / "_SUCCESS").exists():  # lost the rename race
            shutil.rmtree(staging, ignore_errors=True)
        else:
            raise
    return str(base)
