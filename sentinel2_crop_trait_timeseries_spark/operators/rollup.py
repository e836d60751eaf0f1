"""Retention-tier rollups (hourly/daily/weekly) + continuous aggregates.

The reference downsamples its dense reconstruction to daily means via
``meteo.resample('D').mean()`` (/root/reference/src/04_reconstruct_s2_traits.py:396-397)
and computes per-region percentile profiles
(/root/reference/src/validation/04_temporal_profiles.py:188-206).
Generalized here to a 3-tier retention cascade:

    hourly  = groupBy(keys, date_trunc('hour', ts))
    daily   = re-aggregated FROM hourly  (sum-of-sums / sum-of-counts)
    weekly  = re-aggregated FROM daily

Cascading guarantees tier consistency (weekly == re-agg of daily by
construction) and is the scale-optimal plan: the big shuffle happens
once at the finest tier; coarser tiers shuffle the already-reduced
rollup, orders of magnitude smaller. All aggregates are algebraic
(sum/count/min/max/sumsq) so Spark's partial aggregation (map-side
combine) applies — the shuffle moves partial states, not raw rows.

Non-algebraic percentiles are computed with EXACT ``percentile``
(the correctness invariant demands bit-match; reference uses exact
numpy quantiles, /root/reference/src/validation/04_temporal_profiles.py:56-63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TIERS = ("hourly", "daily", "weekly")
_TRUNC = {"hourly": "hour", "daily": "day", "weekly": "week"}


def rollup_tier(obs: DataFrame, tier: str, keys: list[str] = ("source", "doc_id"),
                value_col: str = "value", ts_col: str = "ts") -> DataFrame:
    """One tier directly from raw observations (algebraic agg bundle)."""
    bucket = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    return (
        obs.groupBy(*keys, bucket)
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum_value"),
            F.avg(v).alias("mean_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
            F.sum(v * v).alias("sumsq_value"),
        )
        .withColumn("tier", F.lit(tier))
    )


def cascade(obs: DataFrame, keys: list[str] = ("source", "doc_id"),
            value_col: str = "value", ts_col: str = "ts",
            materialize_dir: str | None = None, spark=None) -> dict[str, DataFrame]:
    """All three tiers; daily/weekly re-aggregate the next-finer tier.

    With ``materialize_dir`` each tier is written to parquet finest-first
    and the next tier reads the stored one — the retention-engine
    execution: the raw-observation shuffle happens exactly once; coarser
    tiers re-shuffle only the already-reduced rollup (orders of magnitude
    smaller). Without it, the tiers are lazy views sharing lineage.
    """
    keys = list(keys)
    hourly = rollup_tier(obs, "hourly", keys, value_col, ts_col)
    if materialize_dir is not None:
        assert spark is not None, "materialize_dir requires spark"
        hourly.write.mode("overwrite").parquet(f"{materialize_dir}/hourly")
        hourly = spark.read.parquet(f"{materialize_dir}/hourly")

    def _up(lower: DataFrame, tier: str) -> DataFrame:
        bucket = F.date_trunc(_TRUNC[tier], F.col("bucket_ts")).alias("b2")
        return (
            lower.groupBy(*keys, bucket)
            .agg(
                F.sum("n").alias("n"),
                F.sum("sum_value").alias("sum_value"),
                F.min("min_value").alias("min_value"),
                F.max("max_value").alias("max_value"),
                F.sum("sumsq_value").alias("sumsq_value"),
            )
            .withColumn("mean_value", F.col("sum_value") / F.col("n"))
            .withColumnRenamed("b2", "bucket_ts")
            .withColumn("tier", F.lit(tier))
            .select(*hourly.columns)
        )

    daily = _up(hourly, "daily")
    if materialize_dir is not None:
        daily.write.mode("overwrite").parquet(f"{materialize_dir}/daily")
        daily = spark.read.parquet(f"{materialize_dir}/daily")
    weekly = _up(daily, "weekly")
    if materialize_dir is not None:
        weekly.write.mode("overwrite").parquet(f"{materialize_dir}/weekly")
        weekly = spark.read.parquet(f"{materialize_dir}/weekly")
    return {"hourly": hourly, "daily": daily, "weekly": weekly}


def continuous_aggregate(obs: DataFrame, tier: str = "daily",
                         keys: list[str] = ("source",),
                         value_col: str = "value", ts_col: str = "ts",
                         quantiles: tuple = (0.05, 0.5, 0.95)) -> DataFrame:
    """Cross-doc profile per key+bucket with EXACT percentiles.

    Mirrors the reference's parcel percentile profiles
    (/root/reference/src/validation/04_temporal_profiles.py:188-206).
    """
    bucket = F.date_trunc(_TRUNC[tier], F.col(ts_col)).alias("bucket_ts")
    v = F.col(value_col)
    qcols = [
        F.percentile(v, F.lit(q)).alias(f"q{int(q * 100):02d}") for q in quantiles
    ]
    return obs.groupBy(*keys, bucket).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean_value"),
        F.stddev_pop(v).alias("std_value"),
        *qcols,
    )
