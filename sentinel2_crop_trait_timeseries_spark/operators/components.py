"""Distributed connected components over a pair graph (min-label
propagation) — the step that turns near-duplicate PAIRS into duplicate
CLUSTERS so a canonical document can be kept per cluster.

The dedup queries (MinHash-LSH / SimHash / embedding-cosine,
catalog_docs.py) emit candidate pairs; production dedup needs the
transitive closure of those pairs: if A~B and B~C, {A,B,C} is one
cluster even when A,C never share a band. This module computes, for
every node, the MINIMUM doc_id reachable through the pair graph — a
deterministic integer label (no float conventions needed).

Algorithm: iterative min-label propagation WITH pointer doubling.
Each round every node takes min(own label, neighbors' labels) via one
equi-join + one groupBy, then compresses one hop of indirection
(lbl(x) <- lbl(lbl(x)), a tiny self-join of the label table) — the
doubling turns O(diameter) rounds into O(log diameter): a length-d
chain that plain propagation walks one hop per round collapses in
~log2(d) rounds. Rounds repeat until a fixpoint, witnessed by the
exact label sum (labels are per-node monotone non-increasing, so an
unchanged sum means no label changed — one scan of the new labels
instead of a join against the previous round's).
The loop is a driver-side while over DataFrames — the reference's
only iterative constructs are its fit loops (e.g. the R calibration,
src/scripts_dose_response/01_dose_response_parameter_fitting.R), and
this plays that role for the dedup graph. The edge input and each
round's result are localCheckpoint-ed: the (possibly expensive)
pair-generation chain executes exactly once, lineage stays O(1), and
the convergence check reuses the materialized result.

Scale: the per-round cost is one shuffle of the edge list (label
propagation) plus a node-table self-join (compression) — both
map-side combinable. For adversarial graphs at 100 TB, swap the body
for alternating large-star/small-star contraction (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14), which also
shrinks the EDGE list as it converges; the fixpoint loop + checkpoint
discipline here stay the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


BROADCAST_NODE_CAP = 5_000_000  # labels broadcast below this node count


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iter: int = 25,
    doublings: int = 1,
) -> DataFrame:
    """(id_col, component) for every node; component = min reachable id.

    nodes: one row per node id (nodes absent from edges label
    themselves — singletons stay their own cluster). edges:
    undirected pairs, any orientation, duplicates tolerated (they
    collapse in the symmetrization distinct — callers can skip their
    own pair dedup/grouping). Raises if the fixpoint is not reached
    within max_iter rounds (never expected at diameter-bounded
    near-dup graphs; the cap guards driver runaway on adversarial
    inputs).

    Join strategy: when the node table fits comfortably in an executor
    (< BROADCAST_NODE_CAP rows) the per-round label lookup rides a
    BROADCAST join — the edge list never shuffles, each round is one
    map-side pass + a partial-aggregated min. Above the cap (billions
    of docs) the lookup falls back to a shuffle equi-join and the
    right scale play is large-star/small-star edge contraction (see
    module docstring)."""
    # checkpoint the raw pairs FIRST: the union below references them
    # twice, and without this the (possibly expensive) pair-generation
    # chain would execute twice inside the symmetrization job
    ep = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint(eager=True)
    sym = (
        ep.union(ep.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(
        F.col(id_col).alias("u"), F.col(id_col).alias("lbl")
    ).localCheckpoint(eager=True)
    stats = labels.agg(
        F.count("*").alias("n"),
        # decimal(38,0): an exact fixpoint witness that cannot overflow
        # at any realistic corpus size (sum of <= ~1e9 63-bit ids)
        F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s"),
    ).first()
    small = stats["n"] < BROADCAST_NODE_CAP
    hint = F.broadcast if small else (lambda df: df)
    prev_sum = stats["s"]

    for _ in range(max_iter):
        neigh = (
            sym.join(hint(labels.withColumnRenamed("u", "v")), "v")
            .groupBy("u")
            .agg(F.min("lbl").alias("nlbl"))
        )
        # checkpoint before the doubling self-joins so the heavy edge
        # propagation executes once per round, not once per branch
        prop = (
            labels.join(hint(neigh), "u", "left")
            .select(
                "u",
                F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl")))
                .alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer doubling, `doublings` times: each application follows
        # one hop of label indirection (lbl(x) is itself a node id, so
        # its label exists — inner join; labels only decrease, so
        # least() keeps monotonicity). Default is ONE application:
        # measured on the LSH star graphs, extra applications do not
        # reduce the round count (the fixpoint is limited by label
        # information moving one EDGE hop per round through the
        # propagation join, not by pointer-chain length), so they are
        # pure per-round overhead; the knob stays for graphs whose
        # label chains, not edge hops, dominate.
        x = prop
        for _ in range(doublings):
            # LAZY checkpoint: the fixpoint-witness aggregate below is
            # the single materializing action (prop above is already
            # materialized, so the self-join's two branches read the
            # same cached rows) — one job per doubling instead of two
            x = (
                x.join(
                    hint(x.select(F.col("u").alias("lbl"),
                                  F.col("lbl").alias("lbl2"))),
                    "lbl",
                )
                .select("u", F.least(F.col("lbl"), F.col("lbl2")).alias("lbl"))
                .localCheckpoint(eager=False)
            )
        new_labels = x
        # fixpoint witness: per-node labels are monotonically
        # non-increasing, so the exact label SUM is unchanged iff no
        # label changed — one scan of the checkpointed result instead
        # of a join against the previous round
        cur_sum = new_labels.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)"))
        ).first()[0]
        labels = new_labels
        if cur_sum == prev_sum:
            return labels.select(
                F.col("u").alias(id_col), F.col("lbl").alias("component")
            )
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds"
    )
