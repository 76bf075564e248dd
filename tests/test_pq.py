"""Product-quantization contracts: seed self-encoding, code range, and the
ADC/encode composition staying inside whole-stage codegen (the unrolled
form compiled past the JVM 64 KB method limit and fell back to
interpretation — a silent 10x on the hot path)."""

from __future__ import annotations

from exact_spark.operators.similarity import _PQ_K, _PQ_M, emb_pq_encode, sim_topk_pq


def test_seed_rows_encode_to_zero_error(spark, sf_dir):
    got = emb_pq_encode(spark, sf_dir).toPandas()
    # codebook rows reconstruct exactly: their sub-vectors ARE codewords
    seeds = got[got.vec_id < _PQ_K]
    assert len(seeds) == _PQ_K
    assert (seeds.recon_err_fx == 0).all()
    # every code addresses the 4-bit codebook
    for m in range(_PQ_M):
        assert got[f"code_{m}"].between(0, _PQ_K - 1).all()
    # non-seed rows quantize lossily (fixed-point error strictly positive)
    assert (got[got.vec_id >= _PQ_K].recon_err_fx > 0).all()


def test_adc_topk_shape_and_determinism(spark, sf_dir):
    a = sim_topk_pq(spark, sf_dir).toPandas().sort_values(["query_id", "rank"])
    b = sim_topk_pq(spark, sf_dir).toPandas().sort_values(["query_id", "rank"])
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
    assert set(a.groupby("query_id")["rank"].max()) == {5}
    assert (a.query_id != a.neighbor_id).all()


def test_pq_plan_is_loop_form_single_scan(spark, sf_dir):
    """The codebook must be walked by higher-order functions (loops over
    ONE literal array), not unrolled into per-codeword terms: the unrolled
    expression exceeded the JVM 64 KB method limit and crashed janino into
    interpreted fallback. Loop form = exactly one transform over the
    literal per projection, and no shuffle in the whole encode."""
    qe = emb_pq_encode(spark, sf_dir)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "array_min(transform(" in plan  # HOF argmin, not a 16-struct array
    assert "Exchange" not in plan.replace("Exchange RoundRobin", "")  # scan-only
    # 8 code extractions reference ONE shared 'best' array, not 8 rebuilds
    assert plan.count("array_min(transform(") == 1


def test_pca_whitening_isotropy(spark, sf_dir):
    """After whitening, every kept dimension has mean ~0 and variance ~1
    (the sample == corpus at this SF, so the diagnostic is exact up to
    fp rounding), and eigenvalues come out in descending order."""
    from exact_spark.operators.similarity import _PCA_DIMS, emb_pca_whiten

    rows = {r["dim"]: r for r in emb_pca_whiten(spark, sf_dir).collect()}
    assert len(rows) == _PCA_DIMS
    evs = [rows[j]["eigenvalue"] for j in range(_PCA_DIMS)]
    assert evs == sorted(evs, reverse=True)
    for j in range(_PCA_DIMS):
        assert abs(rows[j]["mean_after"]) < 1e-3
        assert abs(rows[j]["var_after"] - 1.0) < 1e-2
