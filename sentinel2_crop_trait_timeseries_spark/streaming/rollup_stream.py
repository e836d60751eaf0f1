"""Structured Streaming rollup: the hourly tier as a watermarked
windowed aggregation.

The reference is pure batch, but its temporal semantics map 1:1 onto
Structured Streaming (SURVEY.md §2.9): hourly bucketing of irregular
observations == a tumbling event-time window; late scenes == late data
bounded by a watermark. This module exposes the finest rollup tier as a
streaming query so the engine can materialize continuous aggregates
incrementally as new sequence files land, instead of re-running batch
rollups.

At scale: the streaming agg keeps per-(key, window) state; the
watermark bounds state size (windows older than max_event_time -
delay are finalized and evicted). Output goes to the tier's parquet/
Iceberg path in append mode; here tests/oracle use availableNow + a
memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def streaming_hourly_rollup(
    stream: DataFrame,
    keys: list[str] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked tumbling-window hourly aggregate over a stream."""
    v = F.col(value_col)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys, F.window(ts_col, "1 hour").alias("win"))
        .agg(
            F.count(v).alias("n"),
            F.sum(v).alias("sum_value"),
            F.avg(v).alias("mean_value"),
            F.min(v).alias("min_value"),
            F.max(v).alias("max_value"),
        )
    )


def run_file_stream_once(
    spark: SparkSession,
    sf_dir: str,
    file_name: str = "events.parquet",
    keys: list[str] = ("event_type",),
    query_name: str = "s2tt_stream_hourly",
) -> DataFrame:
    """Stream a parquet file source to completion (availableNow) into a
    memory sink; return the final windowed aggregate as a batch frame.

    Complete output mode so every window is emitted regardless of the
    final watermark position (matches the batch/oracle result exactly).
    """
    schema = spark.read.parquet(f"{sf_dir}/{file_name}").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", file_name)
        .parquet(sf_dir)
        # event time must be TIMESTAMP (not NTZ); session tz is UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = streaming_hourly_rollup(stream, keys=list(keys))
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
