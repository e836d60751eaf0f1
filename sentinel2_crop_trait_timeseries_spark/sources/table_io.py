"""Lakehouse table I/O seam: Iceberg when available, parquet fallback.

The engine contract names Iceberg as the ingest/storage format
(BASELINE.json input_hint). This container ships no Iceberg runtime jar,
so the seam is explicit: every read/write in the engine goes through
``read_table`` / ``write_table``, which use the Iceberg DataSource + a
catalog table identifier when the session is Iceberg-enabled and plain
parquet paths otherwise. Behavior-relevant Iceberg features and their
fallback equivalents:

| Iceberg feature            | engine use                | parquet fallback |
|---|---|---|
| partition spec (bucket(doc_id), identity(source, tier)) | co-located per-doc work, partition pruning | partitionBy(tier, source) dirs |
| snapshot isolation / commits | resumable runs            | checkpoint manifest (operators/manifest.py) |
| hidden partition pruning   | time-range scans          | explicit bucket_ts predicate (pushdown tested) |
| schema evolution           | adding tier metrics       | explicit StructType everywhere |

To enable Iceberg on a real cluster, start the session with:

    get_spark(extra_conf={
      "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
      "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
      "spark.sql.catalog.lake.type": "hadoop",
      "spark.sql.catalog.lake.warehouse": "<warehouse-uri>",
    })

and pass identifiers like ``lake.db.sequences`` to these helpers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_enabled(spark: SparkSession) -> bool:
    """True when an Iceberg catalog extension is configured."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "Iceberg" in ext


def _is_identifier(target: str) -> bool:
    return "/" not in target and not target.startswith("file:")


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read a table by Iceberg identifier (``catalog.db.table``) or
    parquet path — whichever the target and session support."""
    if iceberg_enabled(spark) and _is_identifier(target):
        return spark.read.format("iceberg").load(target)
    return spark.read.parquet(target)


def write_table(df: DataFrame, target: str, partition_by: list[str] | None = None,
                mode: str = "overwrite") -> None:
    """Write to an Iceberg table (``writeTo`` with partition transform)
    or a partitioned parquet path."""
    spark = df.sparkSession
    if iceberg_enabled(spark) and _is_identifier(target):
        writer = df.writeTo(target)
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)
