"""Tier cascade consistency + exact percentile continuous aggregates."""

import numpy as np
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.operators.gapfill import gapfill
from sentinel2_crop_trait_timeseries_spark.operators.rollup import (
    cascade,
    continuous_aggregate,
    rollup_tier,
)
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences


def _dense(spark, n=60):
    return gapfill(generate_sequences(spark, n, partitions=4)).cache()


def test_cascade_consistent_with_direct(spark):
    dense = _dense(spark)
    tiers = cascade(dense)
    for tier in ("daily", "weekly"):
        direct = rollup_tier(dense, tier).toPandas().sort_values(
            ["source", "doc_id", "bucket_ts"]).reset_index(drop=True)
        casc = tiers[tier].toPandas().sort_values(
            ["source", "doc_id", "bucket_ts"]).reset_index(drop=True)
        assert len(direct) == len(casc)
        for col in ("n", "min_value", "max_value"):
            assert np.array_equal(direct[col].to_numpy(), casc[col].to_numpy())
        for col in ("sum_value", "mean_value", "sumsq_value"):
            assert np.allclose(direct[col].to_numpy(), casc[col].to_numpy(), rtol=1e-9)


def test_weekly_counts_sum_to_daily(spark):
    tiers = cascade(_dense(spark))
    d = tiers["daily"].groupBy().agg(F.sum("n").alias("n")).collect()[0]["n"]
    w = tiers["weekly"].groupBy().agg(F.sum("n").alias("n")).collect()[0]["n"]
    h = tiers["hourly"].groupBy().agg(F.sum("n").alias("n")).collect()[0]["n"]
    assert d == w == h


def test_continuous_aggregate_exact_percentiles(spark):
    dense = _dense(spark, 30)
    prof = continuous_aggregate(dense, tier="daily", keys=["source"]).toPandas()
    pdf = dense.toPandas()
    pdf["bucket"] = pdf["ts"].dt.floor("D")
    for _, row in prof.head(20).iterrows():
        grp = pdf[(pdf.source == row["source"]) & (pdf.bucket == row["bucket_ts"])]
        assert np.isclose(row["q50"], np.quantile(grp["value"], 0.5))
        assert np.isclose(row["q05"], np.quantile(grp["value"], 0.05))
        assert np.isclose(row["mean_value"], grp["value"].mean())


def test_rollup_partition_invariance(spark):
    a = cascade(gapfill(generate_sequences(spark, 40, partitions=1)))["daily"]
    b = cascade(gapfill(generate_sequences(spark, 40, partitions=6)))["daily"]
    pa = a.toPandas().sort_values(["doc_id", "bucket_ts"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["doc_id", "bucket_ts"]).reset_index(drop=True)
    assert np.allclose(pa["mean_value"], pb["mean_value"])
    assert (pa["n"] == pb["n"]).all()
