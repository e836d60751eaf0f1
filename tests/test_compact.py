"""Compaction operator: fewer files, identical rows, idempotent."""

import os

from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.operators.compact import (
    _parquet_files,
    compact_parquet_dir,
)


def test_compact_reduces_files_preserves_rows_idempotent(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartition(16).write.parquet(path)
    assert len(_parquet_files(path)) == 16
    before = sorted(map(tuple, spark.read.parquet(path).collect()))

    rep = compact_parquet_dir(spark, path, target_rows_per_file=5_000)
    assert rep["action"] == "compacted"
    assert rep["files_before"] == 16 and rep["files_after"] == 2
    assert rep["n_rows"] == 10_000
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before
    # no leftover temp/trash dirs
    assert _parquet_files(path) and not any(
        d.endswith(("__compact_tmp", "__compact_old"))
        for d in os.listdir(str(tmp_path))
    )

    # idempotent: already at/below target -> no rewrite
    rep2 = compact_parquet_dir(spark, path, target_rows_per_file=5_000)
    assert rep2["action"] == "skip"
    assert rep2["files_after"] == 2


def test_compact_single_file_floor(spark, tmp_path):
    path = os.path.join(str(tmp_path), "small")
    spark.range(10).repartition(4).write.parquet(path)
    rep = compact_parquet_dir(spark, path, target_rows_per_file=1_000_000)
    assert rep["action"] == "compacted" and rep["files_after"] == 1
    assert sorted(r["id"] for r in spark.read.parquet(path).collect()) == list(
        range(10)
    )


def test_drop_expired_partitions(spark, tmp_path):
    from pyspark.sql import functions as F

    from sentinel2_crop_trait_timeseries_spark.operators.compact import (
        drop_expired_partitions,
    )

    path = os.path.join(str(tmp_path), "tiered")
    df = spark.range(1000).select(
        F.col("id"),
        F.concat(
            F.lit("2024-01-0"), ((F.col("id") % 5) + 1).cast("string")
        ).alias("day"),
    )
    df.write.partitionBy("day").parquet(path)
    keep = {"2024-01-04", "2024-01-05"}
    rep = drop_expired_partitions(path, keep)
    assert rep["n_dropped"] == 3 and rep["n_kept"] == 2
    assert sorted(rep["dropped"]) == [
        "day=2024-01-01", "day=2024-01-02", "day=2024-01-03"
    ]
    remaining = spark.read.parquet(path)
    assert remaining.count() == 400
    # Spark infers the partition column as DATE on read — compare as strings
    assert {
        r["d"]
        for r in remaining.select(
            F.col("day").cast("string").alias("d")
        ).distinct().collect()
    } == keep
    # idempotent: a second run drops nothing
    rep2 = drop_expired_partitions(path, keep)
    assert rep2["n_dropped"] == 0 and rep2["n_kept"] == 2
    # no trash leftovers
    assert not any(d.endswith("__expired") for d in os.listdir(path))
