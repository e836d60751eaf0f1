"""Streaming incremental near-duplicate detection: newly arriving
documents probe a STATIC MinHash-LSH signature index of the existing
corpus — the production shape of continuous dedup in a training-data
ingestion pipeline (every new crawl shard is checked against the
already-accepted corpus before admission; the corpus index itself is
rebuilt offline at a slower cadence).

Spark shape: the corpus band index is computed once per run and
localCheckpoint-ed (it plays the role an Iceberg signature table would
at scale); arrivals stream in via a file source, and ``foreachBatch``
computes each microbatch's band signatures and equi-joins them against
the index on (band, sig) — the same no-all-pairs LSH candidate plan as
the batch `dedup_minhash_lsh` (catalog_docs.py), restricted to
new-vs-corpus pairs. Candidates append to a parquet sink, so repeated
triggers accumulate exactly the pairs batch dedup would emit for the
same arrival set. Reference analog: the reference's pipeline
re-processes per-parcel scenes incrementally against previously fitted
state (src/processing/process_parcels.py resume logic); this is that
concept for the dedup graph.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_dedup_stream_once(
    spark: SparkSession,
    sf_dir: str,
    file_name: str = "documents.parquet",
    mod: int = 10,
) -> DataFrame:
    """Stream the arrival slice (doc_id % mod == 0) of the documents
    table against the band index of the rest (doc_id % mod != 0);
    returns (doc_new, doc_idx, n_shared_bands) candidate pairs.

    availableNow trigger + append parquet sink: the run drains the
    source to completion and is idempotent per temp sink; at scale the
    sink is an Iceberg table MERGEd on (doc_new, doc_idx)."""
    from sentinel2_crop_trait_timeseries_spark.catalog_docs import (
        _minhash_bands,
    )

    d = spark.read.parquet(f"{sf_dir}/{file_name}")
    index = (
        _minhash_bands(d.filter(F.col("doc_id") % mod != 0))
        .localCheckpoint(eager=True)
    )

    out_path = tempfile.mkdtemp(prefix="s2tt_stream_dedup_")
    stream = (
        spark.readStream.schema(d.schema)
        .option("pathGlobFilter", file_name)
        .parquet(sf_dir)
        .filter(F.col("doc_id") % mod == 0)
    )

    def probe(batch_df: DataFrame, batch_id: int) -> None:
        # broadcast the ARRIVALS (a microbatch is small); the corpus
        # index — arbitrarily large at scale — never moves
        bands = _minhash_bands(batch_df)
        pairs = (
            index.alias("b")
            .join(F.broadcast(bands.alias("a")), ["band", "sig"])
            .groupBy(
                F.col("a.doc_id").alias("doc_new"),
                F.col("b.doc_id").alias("doc_idx"),
            )
            .agg(F.count("*").alias("n_shared_bands"))
        )
        pairs.write.mode("append").parquet(out_path)

    q = (
        stream.writeStream.foreachBatch(probe)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_path)
