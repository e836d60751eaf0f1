"""Approximate-nearest-neighbor indexes over embedding columns.

Three scale paths over ``(id, embedding array<float>)`` corpora, all
built so the CORPUS side never shuffles — only the (small) query side
is replicated and broadcast, and candidates meet through plain hash
equi-joins (never BroadcastNestedLoop / cartesian):

- ``brute_force_topk``: exact baseline; broadcast queries, map-side
  scoring, per-query top-k window.
- ``sign_projection_topk``: sign-random-projection buckets (Charikar
  2002) with Hamming-radius multi-probe (Lv et al., VLDB'07).
- ``ivf_topk``: inverted-file index — argmin assignment against a
  broadcast codebook, queries probe their ``nprobe`` nearest cells.

Determinism discipline (shared with the catalog contract): ranking
keys are ``round(cos, 4)`` with id tie-breaks; cell argmins use
rounded costs with centroid-id tie-breaks; plane/centroid entries are
small exact-in-double values so both Spark and any SQL oracle agree on
every sign bit and cell id.

The catalog queries (``ann_topk_bruteforce``, ``ann_multiprobe``,
``ann_ivf`` in catalog_docs.py) are thin instantiations of these
builders with seeded planes/codebooks; ``ann_recall`` measures recall
of each approximate index against the exact baseline.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b) -> F.Column:
    """Sequential-fold dot product over two array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def _cosine() -> F.Column:
    return F.round(
        F.lit(1e-9)
        + dot(F.col("qe"), F.col("ec")) / (norm(F.col("qe")) * norm(F.col("ec"))),
        4,
    )


def _topk(cand: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    return (
        cand.select("query_id", "neighbor_id", _cosine().alias("cos"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 3,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: queries broadcast against the full corpus.

    At 100 TB the corpus stays partitioned and is scored map-side; the
    per-query top-k is one keyed window over candidates.
    """
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("ec"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"))
    j = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    return _topk(j, k)


def sign_projection_bucket(vec_col, planes: np.ndarray) -> F.Column:
    """Bucket id: bit j set iff dot(vec, planes[j]) > 0."""
    bucket = None
    for j, row in enumerate(planes):
        plane = F.array(*[F.lit(float(v)) for v in row])
        term = F.when(dot(vec_col, plane) > 0, F.lit(1 << j)).otherwise(0)
        bucket = term if bucket is None else bucket + term
    return bucket


def hamming_masks(n_bits: int, radius: int) -> list[int]:
    """All XOR masks within the given Hamming radius (incl. 0)."""
    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(n_bits), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def sign_projection_topk(corpus: DataFrame, queries: DataFrame,
                         planes: np.ndarray, k: int = 3, radius: int = 1,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Multi-probe sign-LSH ANN: bucket the corpus once, explode each
    query over every bucket within ``radius`` bit flips, equi-join on
    the bucket id, re-rank candidates with exact cosine."""
    bucket = sign_projection_bucket(F.col(vec_col), planes)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("ec"),
                      bucket.alias("pbucket"))
    masks = hamming_masks(len(planes), radius)
    q = (
        queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"), bucket.alias("bucket"))
        .select("query_id", "qe", "bucket",
                F.explode(F.array(*[F.lit(m) for m in masks])).alias("mask"))
        .select("query_id", "qe",
                F.col("bucket").bitwiseXOR(F.col("mask")).alias("pbucket"))
    )
    j = c.join(F.broadcast(q), "pbucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(j, k)


def ivf_cells(vec_col, centroids: np.ndarray) -> F.Column:
    """Sorted array of (rounded quantization cost, centroid id) —
    element 1 is the vector's cell, elements 1..nprobe the probe set.
    Cost is |c|^2 - 2 v.c (the |v|^2 term is constant per row)."""
    items = []
    for j, row in enumerate(centroids):
        c2 = float((row * row).sum())
        cen = F.array(*[F.lit(float(v)) for v in row])
        d = F.round(F.lit(1e-9) + F.lit(c2) - 2.0 * dot(vec_col, cen), 4)
        items.append(F.struct(d.alias("d"), F.lit(j).alias("c")))
    return F.array_sort(F.array(*items))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: np.ndarray,
             k: int = 3, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF ANN: corpus rows live in their argmin-cost cell; queries
    probe their ``nprobe`` nearest cells; candidates re-ranked exactly."""
    cells = ivf_cells(F.col(vec_col), centroids)
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("ec"),
                      F.element_at(cells, 1)["c"].alias("cell"))
    probes = F.array(*[F.element_at(cells, i + 1)["c"] for i in range(nprobe)])
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qe"),
                       F.explode(probes).alias("cell"))
    j = c.join(F.broadcast(q), "cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    return _topk(j, k)
