"""grouped_cell_topk (r6 vectorized ANN scoring) equivalence tests.

The r6 rewrite moved candidate scoring from per-candidate interpreted
fold expressions (aggregate(zip_with(...)) + a window over every
candidate row) into a per-cell cogroup numpy kernel with a LEFT-FOLD
accumulation over dimensions. These tests pin the bit-level claim: the
new path returns EXACTLY the rows of the old join+fold+window path on
arbitrary float data (not just the snapped-grid corpora).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.session import get_spark
from sentinel2_crop_trait_timeseries_spark.operators.ann import (
    _topk,
    brute_force_topk,
    grouped_cell_topk,
)


@pytest.fixture(scope="module")
def spark():
    return get_spark("test_ann_cell_topk", master="local[4]",
                     shuffle_partitions=4)


def _corpus(spark, n=300, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(int(i), [float(v) for v in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def _old_brute_force(corpus, queries, k):
    """The pre-r6 plan: broadcast nested-loop candidates + fold cosine
    + a window over every candidate row (kept here as the equivalence
    oracle for the rewrite)."""
    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").alias("ec"))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("qe"))
    j = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    return _topk(j, k)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_brute_force_matches_old_plan_bitwise(spark):
    e = _corpus(spark)
    q = e.filter(F.col("vec_id") % 25 == 0)
    old = _rows(_old_brute_force(e, q, 3))
    new = _rows(brute_force_topk(e, q, k=3))
    assert new == old  # ids, ranks AND rounded cos bit-identical


def test_grouped_cell_topk_matches_old_plan_on_buckets(spark):
    """Bucketed candidates (each corpus row in one cell, each query
    probing 2 distinct cells) — the sign-LSH / IVF shape."""
    e = _corpus(spark, n=400, seed=11)
    cell = F.pmod(F.xxhash64("vec_id"), F.lit(8)).cast("int")
    c = e.select(F.col("vec_id").alias("neighbor_id"),
                 F.col("embedding").alias("ec"), cell.alias("cell"))
    q = (
        e.filter(F.col("vec_id") % 20 == 0)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qe"), cell.alias("cell"))
        .select("query_id", "qe",
                F.explode(F.array(F.col("cell"),
                                  (F.col("cell") + 1) % 8)).alias("cell"))
    )
    old_j = c.join(F.broadcast(q.withColumnRenamed("cell", "cell_q")),
                   F.col("cell") == F.col("cell_q")).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    old = _rows(_topk(old_j, 3))
    new = _rows(grouped_cell_topk(c, q, 3))
    assert new == old


def test_brute_force_partition_invariance(spark):
    e = _corpus(spark, n=250, seed=23)
    q = e.filter(F.col("vec_id") % 25 == 0)
    a = _rows(brute_force_topk(e.repartition(1), q, k=3))
    b = _rows(brute_force_topk(e.repartition(13), q, k=3))
    assert a == b
