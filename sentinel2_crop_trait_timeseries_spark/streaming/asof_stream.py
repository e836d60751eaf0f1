"""Streaming ASOF enrichment: arriving events probe a STATIC keyed
reference index for the latest reading at-or-before their timestamp —
the continuous-ingestion twin of catalog_ts.asof_join_clicks (every
arriving scene row picks up the most recent meteo reading; the meteo
index itself refreshes offline at a slower cadence — reference analog:
src/04_reconstruct_s2_traits.py:216 ``merge_with_meteo`` run
incrementally instead of per-campaign).

Spark shape: the reference index (user_id, ts_us, click_cents) is
deduped, computed once and localCheckpoint-ed; arrivals stream via a
file source and ``foreachBatch`` BROADCASTS each (small) microbatch
against the index with an equi-join on user plus the backward-time
predicate, keeping the max-ts match per arrival. The index — the big
side — never moves; per-arrival work is bounded by that user's own
reference history (same skew contract as the batch union-tag plan).
Results append to a parquet sink, so repeated triggers accumulate
exactly the batch ASOF rows for the same arrival set.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_US = "cast(unix_micros(cast(ts as timestamp)) as bigint)"
_CENTS = "cast(round(value * 100) as bigint)"


def run_asof_stream_once(
    spark: SparkSession,
    sf_dir: str,
    file_name: str = "events.parquet",
    mod: int = 10,
) -> DataFrame:
    """Stream the arrival slice (non-click events with event_id % mod
    == 0) against the static click index; returns the batch-ASOF
    columns (event_id, user_id, event_type, ts_us, click_cents,
    staleness_us) for exactly the arrival rows."""
    d = spark.read.parquet(f"{sf_dir}/{file_name}")
    index = (
        d.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            F.expr(_US).alias("ref_us"),
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("user_id", "ref_us")
        .agg(F.max("cents").alias("bc"))
        .localCheckpoint(eager=True)
    )

    out_path = tempfile.mkdtemp(prefix="s2tt_stream_asof_")
    stream = (
        spark.readStream.schema(d.schema)
        .option("pathGlobFilter", file_name)
        .parquet(sf_dir)
        .filter(
            (F.col("event_type") != "click")
            & (F.col("event_id") % mod == 0)
        )
    )

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        arr = batch_df.select(
            "event_id",
            "user_id",
            "event_type",
            F.expr(_US).alias("ts_us"),
        )
        matched = (
            index.alias("b")
            .join(
                F.broadcast(arr.alias("a")),
                (F.col("b.user_id") == F.col("a.user_id"))
                & (F.col("b.ref_us") <= F.col("a.ts_us")),
            )
            .groupBy("a.event_id")
            .agg(
                F.max_by(
                    F.struct("b.ref_us", "b.bc"), F.col("b.ref_us")
                ).alias("m")
            )
            .select(
                "event_id",
                F.col("m.bc").alias("click_cents"),
                F.col("m.ref_us").alias("click_ts_us"),
            )
        )
        out = arr.join(matched, "event_id", "left").select(
            "event_id",
            "user_id",
            "event_type",
            "ts_us",
            "click_cents",
            (F.col("ts_us") - F.col("click_ts_us")).alias("staleness_us"),
        )
        out.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
