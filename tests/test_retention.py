"""Retention serving view + invalidation-based incremental refresh
(operators/rollup.py). The catalog oracles prove value parity vs
DuckDB; these tests pin the STRUCTURAL invariants: the serving tiers
partition the event set exactly, and the incremental refresh is
bit-equal to a full recompute — including the empty-late degenerate
case and late rows that open brand-new buckets."""

import pyspark.sql.functions as F
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.rollup import (
    incremental_refresh,
    retention_serving,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .select("event_id", "event_type", "ts", "value")
        .cache()
    )


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(v, 6) if isinstance(v, float) else v for v in r)
        for r in df.select(*cols).collect()
    )


def test_serving_partitions_events_exactly(events):
    out = retention_serving(events.drop("event_id")).cache()
    # every event lands in exactly one tier: total n is the row count
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == events.count()
    # the 30-day fixture populates all four policy bands
    tiers = {r["tier"] for r in out.select("tier").distinct().collect()}
    assert tiers == {"raw", "hourly", "daily", "weekly"}
    # tier buckets are aligned to their width (weekly: Monday-aligned)
    bad = out.filter(
        ((F.col("tier") == "hourly") & (F.col("bucket_ts") % 3600 != 0))
        | ((F.col("tier") == "daily") & (F.col("bucket_ts") % 86400 != 0))
        | (
            (F.col("tier") == "weekly")
            & ((F.floor(F.col("bucket_ts") / 86400) + 3) % 7 != 0)
        )
    ).count()
    assert bad == 0
    out.unpersist()


def test_incremental_refresh_equals_full_recompute(events):
    ev = events
    late = ev.filter(F.col("event_id") % 20 == 0).drop("event_id")
    initial = ev.filter(F.col("event_id") % 20 != 0).drop("event_id")
    got = incremental_refresh(initial, late)
    want = incremental_refresh(ev.drop("event_id"), late.limit(0))
    assert _rows(got) == _rows(want)


def test_incremental_refresh_empty_late_is_old_materialization(events):
    # empty invalidation log => the refresh IS the old materialization:
    # one bucket per distinct (event_type, day), counts sum to the table
    ev = events.drop("event_id")
    got = incremental_refresh(ev, ev.limit(0)).cache()
    n_buckets = (
        ev.select(
            "event_type",
            (F.floor(F.col("ts").cast("timestamp").cast("long") / 86400)).alias("d"),
        )
        .distinct()
        .count()
    )
    assert got.count() == n_buckets
    assert got.agg(F.sum("n")).collect()[0][0] == ev.count()
    got.unpersist()


def test_incremental_refresh_handles_new_buckets(spark, events):
    # late rows strictly OUTSIDE the initial time range: the refresh
    # must open brand-new buckets (the anti/semi tiling covers buckets
    # absent from the old materialization)
    ev = events.drop("event_id").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    late = ev.withColumn(
        "ts",
        F.timestamp_seconds(F.col("ts").cast("long") + 365 * 86400),
    ).limit(50)
    got = incremental_refresh(ev, late)
    want = incremental_refresh(ev.unionByName(late), late.limit(0))
    assert _rows(got) == _rows(want)


def test_refresh_joins_broadcast_the_invalidation_log(events):
    ev = events
    late = ev.filter(F.col("event_id") % 20 == 0).drop("event_id")
    initial = ev.filter(F.col("event_id") % 20 != 0).drop("event_id")
    plan = (
        incremental_refresh(initial, late)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the invalidation log must broadcast into both the anti and the
    # semi join — never shuffle the table against it
    assert "BroadcastHashJoin" in plan
    assert "LeftAnti" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan
