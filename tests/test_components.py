"""Connected components (min-label propagation): hand-checked graphs,
fixpoint behavior, singleton handling."""

import pytest

from sentinel2_crop_trait_timeseries_spark.operators.components import (
    connected_components,
)


def test_chain_clique_and_singletons(spark):
    # chain 1-2-3 (transitive, no direct 1-3 edge), clique 10-11-12,
    # pair 20-21, singletons 30, 31
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 10, 11, 12, 20, 21, 30, 31]], "doc_id long"
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (10, 12), (11, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20, 30: 30, 31: 31}


def test_long_path_converges(spark):
    # a 12-node path needs ~11 propagation rounds — exercises the loop
    n = 12
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = connected_components(nodes, edges).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n


def test_nonconvergence_raises(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        # doublings=1 (the slow-compression setting) so the length-5
        # chain genuinely cannot finish in 2 rounds; the default
        # doublings=3 compresses 8 hops per round and converges
        connected_components(nodes, edges, max_iter=2, doublings=1)
