"""Distributed connected components over a pair graph (min-label
propagation) — the step that turns near-duplicate PAIRS into duplicate
CLUSTERS so a canonical document can be kept per cluster.

The dedup queries (MinHash-LSH / SimHash / embedding-cosine,
catalog_docs.py) emit candidate pairs; production dedup needs the
transitive closure of those pairs: if A~B and B~C, {A,B,C} is one
cluster even when A,C never share a band. This module computes, for
every node, the MINIMUM doc_id reachable through the pair graph — a
deterministic integer label (no float conventions needed).

Algorithm: iterative min-label propagation. Each round every node
takes min(own label, neighbors' labels) via one equi-join + one
groupBy; rounds repeat until a fixpoint (no label changed). The loop
is a driver-side while over DataFrames — the reference's only
iterative constructs are its fit loops (e.g. the R calibration,
src/scripts_dose_response/01_dose_response_parameter_fitting.R), and
this plays that role for the dedup graph. Each round's result is
localCheckpoint-ed: lineage stays O(1) instead of growing by two
shuffles per round, and the convergence check reuses the materialized
result instead of re-running the chain.

Scale: propagation converges in O(graph diameter) rounds — near-dup
clusters are dense (clone clusters are near-cliques, diameter 1-2),
so a handful of rounds suffices in practice. For adversarial
long-chain graphs at 100 TB, swap the propagation body for
alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) which bounds
rounds by O(log^2 n); the join/groupBy shape — and this module's
fixpoint loop + checkpoint discipline — stay the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id_col, component) for every node; component = min reachable id.

    nodes: one row per node id (nodes absent from edges label
    themselves — singletons stay their own cluster). edges:
    undirected pairs, any orientation, duplicates tolerated.
    Raises if the fixpoint is not reached within max_iter rounds
    (never expected at diameter-bounded near-dup graphs; the cap
    guards driver runaway on adversarial inputs).
    """
    sym = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
        .union(edges.select(F.col(dst_col).alias("u"),
                            F.col(src_col).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("u"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        neigh = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        new_labels = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl")))
                .alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                F.col("u").alias(id_col), F.col("lbl").alias("component")
            )
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
