"""Physical-plan audits: the scale invariants that make queries survive a
100x scale-up, asserted against `explain()` output so they can't silently
regress.

- dimension joins stay broadcast (no shuffle of the small side)
- parquet scans prune columns (a 3-column projection must not read the
  whole documents table) and push predicates
- no CartesianProduct and no row-at-a-time Python UDF (BatchEvalPython)
  anywhere in the declarative query set — Python appears only as
  Arrow-batched stages (ArrowEvalPython / mapInPandas) where models score.
"""

from __future__ import annotations

import contextlib
import io as _io

import pytest

from exact_spark.registry import REGISTRY, _load_all

_load_all()

# Queries whose construction is fully lazy (no driver-side collect or
# iterative fixpoint during plan building) — safe to explain without
# running the job.
_LAZY = [
    "rel_pricing_summary",
    "rel_region_revenue",
    "rel_top_customers",
    "rel_distinct_two_phase",
    "rel_order_priority_smj",
    "text_profile",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_topk_cosine",
    "multimodal_binary_meta",
    "text_filter_pipeline",
    "emb_quantize_int8",
    "sim_ivf_recall",
]


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.mark.parametrize("name", _LAZY)
def test_no_cartesian_no_python_row_udf(spark, sf_dir, name):
    plan = plan_of(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    # BatchEvalPython = row-at-a-time Python UDF; the engine bans it.
    assert "BatchEvalPython" not in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    # customer/nation/region ride the task broadcast; only the two fact
    # tables (lineitem, orders) may shuffle.
    plan = plan_of(spark, sf_dir, "rel_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    plan = plan_of(spark, sf_dir, "rel_top_customers")
    assert plan.count("BroadcastHashJoin") >= 2


def test_documents_scan_prunes_columns(spark, sf_dir):
    # text_profile touches doc_id/lang/text only; n_chars and source must
    # not reach the parquet reader.
    plan = plan_of(spark, sf_dir, "text_profile")
    scan_lines = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan_lines, plan
    for ln in scan_lines:
        assert "n_chars" not in ln
        assert "source" not in ln


def test_pricing_filter_pushed_to_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "rel_pricing_summary")
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("l_shipdate" in ln for ln in pushed), plan


def test_codegen_covers_text_pipeline(spark, sf_dir):
    # the single-scan profile should run inside whole-stage codegen
    # (simple mode marks codegen stages with a "*(n)" prefix)
    plan = plan_of(spark, sf_dir, "text_profile", mode="simple")
    assert "*(" in plan


def test_interval_join_is_equi_join(spark, sf_dir):
    """ts_interval_join's range predicate must ride an equi-join on
    (user_id, bin) — a nested-loop/cartesian on the inequality is exactly
    the plan shape the bin expansion exists to prevent."""
    plan = plan_of(spark, sf_dir, "ts_interval_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__bin" in plan  # the composite equi-key is actually in the join


def test_quantize_has_no_shuffle(spark, sf_dir):
    """emb_quantize_int8 is per-row array math — any Exchange in its plan
    is a regression."""
    plan = plan_of(spark, sf_dir, "emb_quantize_int8")
    assert "Exchange" not in plan


def test_rollup_uses_expand_single_pass(spark, sf_dir):
    """rel_revenue_rollup must compute all grouping sets via one Expand +
    one aggregation, not a union of per-level scans."""
    plan = plan_of(spark, sf_dir, "rel_revenue_rollup")
    assert "Expand" in plan
    simple = plan_of(spark, sf_dir, "rel_revenue_rollup", mode="simple")
    assert simple.count("FileScan parquet") <= 4  # each table scanned once


def test_vocab_topk_is_distributed(spark, sf_dir):
    """text_vocab_topk's top-K must be TakeOrderedAndProject over the
    aggregated vocabulary — a global-window row_number over the full
    vocab would serialize into one task."""
    plan = plan_of(spark, sf_dir, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan
