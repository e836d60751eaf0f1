"""Engine-operator-backed catalog queries: Gorilla compression
round-trip, salted skew-safe rollup, streaming rollup, multimodal
metadata extraction — each still verified against a DuckDB oracle.

Unlike catalog.py (pure relational plans), these route through the
engine's Arrow-batch operators, so the oracle checks prove the CUSTOM
code paths (bit-packed codec, two-stage salted agg, watermarked stream,
binary-payload UDF) produce exactly the relational answer.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.catalog import (
    _SQL_HOUR,
    _bucket,
    _epoch,
    _q,
    _t,
)
from sentinel2_crop_trait_timeseries_spark.operators.compress import (
    compress_segments,
    decompress_segments,
)
from sentinel2_crop_trait_timeseries_spark.operators.multimodal import (
    attach_payload,
    decode_meta,
)
from sentinel2_crop_trait_timeseries_spark.streaming.rollup_stream import (
    run_file_stream_once,
)


@_q(
    "gorilla_roundtrip",
    """
    SELECT user_id, count(*) AS n,
           round(1e-9 + sum(value), 4) AS sum_value,
           cast(floor(epoch(min(ts))) AS bigint) AS first_epoch,
           cast(floor(epoch(max(ts))) AS bigint) AS last_epoch
    FROM events GROUP BY 1
    """,
)
def gorilla_roundtrip(spark, sf_dir):
    """Gorilla codec proof: per-user series -> bit-packed blob
    (delta-of-delta ts + XOR floats, applyInPandas) -> decode
    (mapInPandas) -> aggregate; the oracle aggregates the raw rows.
    Matching sums/extents prove the codec is lossless end-to-end
    through the Arrow boundary."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    seg = compress_segments(ev, keys=["user_id"])
    back = decompress_segments(seg, keys=["user_id"])
    return back.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.round(F.lit(1e-9) + F.sum("value"), 4).alias("sum_value"),
        F.min("ts_epoch").alias("first_epoch"),
        F.max("ts_epoch").alias("last_epoch"),
    )


@_q(
    "rollup_hourly_salted",
    f"""
    SELECT event_type,
           {_SQL_HOUR} AS bucket_ts,
           count(*) AS n,
           round(1e-9 + sum(value), 4) AS sum_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def rollup_hourly_salted(spark, sf_dir):
    """Skew-safe rollup: explicit two-stage aggregation with an 8-way
    salt on the grouping key. Stage 1 shuffles on (key, bucket, salt) so
    one hot key spreads over 8 reducers; stage 2 merges the (tiny)
    salted partials. Result is identical to the unsalted rollup — the
    oracle is the plain GROUP BY. This is the north_rule's explicit skew
    handling; AQE skew-join covers the join side."""
    ev = _t(spark, sf_dir, "events")
    salt = (F.col("event_id") % 8).alias("salt")
    stage1 = ev.groupBy(
        "event_type", _bucket("ts", 3600).alias("bucket_ts"), salt
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("value").alias("ps"),
        F.min("value").alias("pmn"),
        F.max("value").alias("pmx"),
    )
    return stage1.groupBy("event_type", "bucket_ts").agg(
        F.sum("pn").alias("n"),
        F.round(F.lit(1e-9) + F.sum("ps"), 4).alias("sum_value"),
        F.min("pmn").alias("min_value"),
        F.max("pmx").alias("max_value"),
    )


@_q(
    "streaming_rollup_hourly",
    f"""
    SELECT event_type,
           {_SQL_HOUR} AS bucket_ts,
           count(*) AS n,
           round(1e-9 + sum(value), 4) AS sum_value,
           round(1e-9 + avg(value), 4) AS mean_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def streaming_rollup_hourly(spark, sf_dir):
    """Structured Streaming tier: the hourly rollup as a watermarked
    tumbling-window streaming aggregation (file source, availableNow,
    memory sink) — must equal the batch rollup exactly."""
    res = run_file_stream_once(spark, sf_dir)
    return res.select(
        "event_type",
        F.col("win.start").cast("long").alias("bucket_ts"),
        "n",
        F.round(F.lit(1e-9) + F.col("sum_value"), 4).alias("sum_value"),
        F.round(F.lit(1e-9) + F.col("mean_value"), 4).alias("mean_value"),
        "min_value",
        "max_value",
    )


@_q(
    "multimodal_meta",
    """
    SELECT doc_id, length(text) AS byte_len,
           ascii(substr(text, 1, 1)) AS first_byte,
           cast(sum(ascii(substr(text, i, 1))) AS BIGINT) AS checksum
    FROM documents,
         LATERAL (SELECT unnest(generate_series(1, length(text))) AS i) t
    GROUP BY doc_id, text
    """,
)
def multimodal_meta(spark, sf_dir):
    """Multimodal plumbing proof: opaque binary payload column ->
    Arrow-batch metadata extraction (mapInPandas over bytes). The oracle
    recomputes length/first-byte/checksum from the (ASCII) source text
    with pure SQL — matching values prove the binary transfer and batch
    iteration are byte-exact."""
    d = _t(spark, sf_dir, "documents")
    return decode_meta(attach_payload(d))


def _events_as_sequences(spark, sf_dir):
    """events -> per-user tokenized sequences (hour-bucketed means),
    via the engine's exact token codec. doc_id = user_id; values are
    quantized to 3 dp by the codec on both engines identically."""
    from sentinel2_crop_trait_timeseries_spark.operators.decode import (
        encode_sequences,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("user_id"),
        F.floor(_epoch("ts") / 3600).cast("long").alias("h"),
    ).agg((F.round(F.avg("value") * 1000) / 1000.0).alias("value"))
    obs = hourly.select(
        F.lit("events").alias("source"),
        F.col("user_id").cast("string").alias("doc_id"),
        F.timestamp_seconds(F.col("h") * 3600).alias("ts"),
        "value",
    )
    return encode_sequences(obs)


@_q(
    "token_roundtrip",
    """
    WITH hourly AS (
      SELECT user_id,
             cast(floor(floor(epoch(ts)) / 3600) AS bigint) AS h,
             round(avg(value) * 1000) / 1000.0 AS v
      FROM events GROUP BY 1, 2
    )
    SELECT cast(user_id AS varchar) AS doc_id,
           count(*) AS n,
           round(1e-9 + sum(v), 3) AS sum_value,
           min(h) * 3600 AS first_epoch,
           max(h) * 3600 AS last_epoch
    FROM hourly GROUP BY 1
    """,
)
def token_roundtrip(spark, sf_dir):
    """The per-row token-array invariant, oracle-checked: hour-bucketed
    event series -> ENCODE into (doc_id, tokens, n_tok, source) ->
    DECODE back -> aggregate. Matching sums/extents prove the token
    codec is an exact identity on real data; the oracle aggregates the
    hourly series directly."""
    from sentinel2_crop_trait_timeseries_spark.operators.decode import (
        EPOCH_UNIX,
        decode_observations,
    )

    seq = _events_as_sequences(spark, sf_dir)
    back = decode_observations(seq)
    return back.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.round(F.lit(1e-9) + F.sum("value"), 3).alias("sum_value"),
        F.min(F.col("ts").cast("long")).alias("first_epoch"),
        F.max(F.col("ts").cast("long")).alias("last_epoch"),
    )


@_q("enkf_assimilate_events", None)
def enkf_assimilate_events(spark, sf_dir):
    """EnKF assimilation over event-derived sequences (no SQL oracle:
    sequential ensemble recursion; driver records rows-only)."""
    from sentinel2_crop_trait_timeseries_spark.operators.enkf import (
        enkf_assimilate,
    )

    seq = _events_as_sequences(spark, sf_dir)
    res = enkf_assimilate(seq, n_sim=20)
    return res.select(
        "doc_id", "pos",
        F.round(F.col("assim_mean"), 4).alias("assim_mean"),
        F.round(F.col("assim_std"), 4).alias("assim_std"),
    )


@_q("fit_sigmoid_events", None)
def fit_sigmoid_events(spark, sf_dir):
    """Per-doc batched-LM sigmoid fit over event-derived sequences
    (no SQL oracle: iterative NLS; driver records rows-only)."""
    from sentinel2_crop_trait_timeseries_spark.operators.fit import fit_sigmoid

    seq = _events_as_sequences(spark, sf_dir)
    return fit_sigmoid(seq).select(
        "doc_id", "n_obs", "status",
        F.round("fit_rmse", 4).alias("fit_rmse"),
    )
