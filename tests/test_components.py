"""Connected-components kernel invariants (dedup duplicate-group clustering).

The fixpoint contract: every node's component_id is the minimum doc_id
reachable from it, independent of partitioning and edge orientation, with
convergence in O(log diameter) iterations (pointer jumping) — verified on
a path graph far deeper than the iteration cap would allow for plain
one-hop propagation.
"""

from __future__ import annotations

from exact_spark.operators.dedup import _CC_MAX_ITERS, connected_components


def _run(spark, pairs):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r.doc_id: r.component_id for r in connected_components(edges).collect()}


def test_two_components_and_orientation(spark):
    # star {1,2,3,4} written in mixed orientation + clique {10,11,12}
    got = _run(spark, [(2, 1), (1, 3), (4, 1), (10, 11), (12, 11), (10, 12)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}


def test_long_path_converges_beyond_onehop_budget(spark):
    # path 0-1-2-...-n: diameter n >> _CC_MAX_ITERS, so plain min
    # propagation could NOT converge inside the cap — pointer jumping must.
    n = 3 * _CC_MAX_ITERS
    edges = [(i, i + 1) for i in range(n)]
    got = _run(spark, edges)
    assert len(got) == n + 1
    assert set(got.values()) == {0}


def test_partition_invariance(spark):
    pairs = [(i, i + 5) for i in range(40)]  # overlapping chains
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    a = {r.doc_id: r.component_id for r in connected_components(edges).collect()}
    b = {
        r.doc_id: r.component_id
        for r in connected_components(edges.repartition(7, "doc_b")).collect()
    }
    assert a == b
    # chains i -> i+5 connect every id sharing i % 5
    for i, comp in a.items():
        assert comp == i % 5
