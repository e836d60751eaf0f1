"""Semantic + plan + partition-invariance tests for the layout/sketch
batch (catalog_sketch.py): z-order clustering cells, count-min heavy
hitters, Bloom semi-join pruning. Oracle equality is covered by
tools/check_contract.py and the driver gate; these pin the invariants
each docstring promises.
"""

import os

from pyspark.sql import Row, functions as F

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_sketch as csk  # noqa: F401

SF = "/root/testdata/sf0.001"


def _z(u, d):
    z = 0
    for i in range(10):
        z |= ((u >> i) & 1) << (2 * i + 1)
        z |= ((d >> i) & 1) << (2 * i)
    return z


def test_zorder_cells_bound_both_dims(spark):
    rows = QUERIES["zorder_cell_stats"]["fn"](spark, SF).collect()
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r["n_events"] for r in rows) == n_events
    for r in rows:
        assert 0 <= r["cell"] < 4096
        # the z-order property: a 256-z-point cell is a 16x16 tile
        assert 0 <= r["u_span"] <= 15 and r["u_span"] == r["u_max"] - r["u_min"]
        assert 0 <= r["d_span"] <= 15 and r["d_span"] == r["d_max"] - r["d_min"]
        # every member of a cell shares the z prefix: recompute from the
        # python twin on the corner points
        assert _z(r["u_min"], r["d_min"]) >> 8 == r["cell"]
        assert _z(r["u_max"], r["d_max"]) >> 8 == r["cell"]


def test_zorder_partition_invariance(spark):
    fn = QUERIES["zorder_cell_stats"]["fn"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = sorted(map(tuple, fn(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = sorted(map(tuple, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


def test_cms_one_sided_and_exact_counts(spark):
    rows = QUERIES["heavy_hitters_cms"]["fn"](spark, SF).collect()
    assert len(rows) == 20
    # ground truth from a direct recount
    truth = {
        r["w"]: r["n"]
        for r in (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select(
                F.explode(
                    F.filter(F.split("text", r"\s+"), lambda x: x != "")
                ).alias("w")
            )
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert sorted(r["word"] for r in rows) == sorted(w for w, _ in top)
    for r in rows:
        assert r["exact_cnt"] == truth[r["word"]]
        # count-min error is one-sided
        assert r["cms_est"] >= r["exact_cnt"]
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


def test_cms_no_collision_tiny_vocab(spark, tmp_path):
    d = str(tmp_path)
    docs = [
        Row(doc_id=1, text="a a a b", lang="en", source="s", n_chars=7),
        Row(doc_id=2, text="b c", lang="en", source="s", n_chars=3),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    rows = {r["word"]: r for r in QUERIES["heavy_hitters_cms"]["fn"](spark, d).collect()}
    assert {w: r["exact_cnt"] for w, r in rows.items()} == {"a": 3, "b": 2, "c": 1}
    # 3 words in 4x1024 cells: deterministic fixture, no collisions
    for r in rows.values():
        assert r["overcount"] == 0


def test_kmv_estimate_and_mergeability(spark):
    row = QUERIES["kmv_distinct_estimate"]["fn"](spark, SF).collect()[0]
    assert row["k_eff"] == min(256, row["n_exact"])
    assert row["err_bp"] == abs(row["kmv_est"] - row["n_exact"]) * 10000 // row["n_exact"]
    # k=256 gives sigma ~ 1/sqrt(k-2) ~ 6.3%; 20% is a ~3-sigma bound
    # on this fixed deterministic fixture
    assert row["err_bp"] < 2000

    # mergeability: bottom-k of per-shard bottom-k's == global bottom-k
    from sentinel2_crop_trait_timeseries_spark.catalog_sketch import _KMV_K

    d = spark.read.parquet(f"{SF}/documents.parquet")
    h = d.select(
        F.col("doc_id"),
        F.explode(F.filter(F.split("text", r"\s+"), lambda x: x != "")).alias("w"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 15), 16, 10)
        .cast("long")
        .alias("h"),
    )
    glob = [r["h"] for r in h.select("h").distinct().orderBy("h").limit(_KMV_K).collect()]
    shards = []
    for p in (0, 1):
        shards += [
            r["h"]
            for r in h.filter(F.col("doc_id") % 2 == p)
            .select("h")
            .distinct()
            .orderBy("h")
            .limit(_KMV_K)
            .collect()
        ]
    merged = sorted(set(shards))[:_KMV_K]
    assert merged == glob


def test_bloom_no_false_negatives_and_counts(spark):
    row = QUERIES["bloom_semijoin_prune"]["fn"](spark, SF).collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    assert row["n_probe_keys"] == orders.select("o_custkey").distinct().count()
    assert row["n_orders_total"] == orders.count()
    # no false negatives: every member key passes, so the independently
    # computed false-positive count must equal pass - member exactly
    assert row["n_false_pos_keys"] == row["n_pass_keys"] - row["n_member_keys"]
    assert row["n_pass_keys"] >= row["n_member_keys"] >= 1
    assert row["n_orders_pass"] >= row["n_orders_member"]


def test_sketch_plans(spark):
    from tests.test_plans import _executed

    for name in ("zorder_cell_stats", "heavy_hitters_cms", "bloom_semijoin_prune"):
        plan = _executed(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    # the KMV bottom-k must be a map-side partial top-k, and its only
    # join is the 1-row broadcast of the sketch stats
    kmv = _executed(spark, "kmv_distinct_estimate")
    assert "TakeOrderedAndProject" in kmv
    assert "CartesianProduct" not in kmv and "SortMergeJoin" not in kmv
    # the Bloom probe and the CMS estimate join must stay broadcast
    assert "BroadcastHashJoin" in _executed(spark, "bloom_semijoin_prune")
    assert "BroadcastHashJoin" in _executed(spark, "heavy_hitters_cms")
    # zorder is projection + one hash aggregate: no join at all
    z = _executed(spark, "zorder_cell_stats")
    assert "Join" not in z


def test_late_r5_partition_invariance(spark):
    """Every late-r5 batch query is exact-integer by construction, so
    its collected output must be bit-identical under different shuffle
    partitioning (the house invariance contract)."""
    names = (
        "heavy_hitters_cms",
        "bloom_semijoin_prune",
        "kmv_distinct_estimate",
        "state_durations_user",
        "cdc_merge_apply",
        "dq_expectations_orders",
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            fn = QUERIES[name]["fn"]
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = sorted(map(tuple, fn(spark, SF).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = sorted(map(tuple, fn(spark, SF).collect()))
            assert a == b, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
