"""Checkpoint manifest: commit metrics, anti-join resume, summary."""

import pytest
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.operators.decode import (
    decode_observations,
)
from sentinel2_crop_trait_timeseries_spark.operators.manifest import (
    CheckpointManifest,
)
from sentinel2_crop_trait_timeseries_spark.operators.rollup import rollup_tier
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences


@pytest.fixture(scope="module")
def seq(spark):
    return generate_sequences(spark, 60, partitions=4).cache()


def test_resume_processes_only_todo(spark, seq, tmp_path):
    man = CheckpointManifest(spark, str(tmp_path / "manifest"))
    all_keys = seq.select("source").distinct()
    n_all = all_keys.count()

    # first (partial) run: roll up and commit only sources starting src_1
    part1 = seq.filter(F.col("source").startswith("src_1"))
    metrics1 = (
        rollup_tier(decode_observations(part1), "hourly", keys=["source"])
        .groupBy("source")
        .agg(F.sum("n").alias("rows_rolled"))
    )
    run1 = man.commit_metrics("hourly", metrics1, key_col="source")
    n_done = man.done_keys("hourly").count()
    assert 0 < n_done < n_all

    # resume: todo is exactly the complement
    todo = man.todo(all_keys, "hourly", key_col="source")
    assert todo.count() == n_all - n_done
    assert (
        todo.join(man.done_keys("hourly"),
                  todo.source == F.col("partition_key"), "inner").count() == 0
    )

    # second run completes the rest; todo drains to zero
    part2 = seq.join(todo, "source", "left_semi")
    metrics2 = (
        rollup_tier(decode_observations(part2), "hourly", keys=["source"])
        .groupBy("source")
        .agg(F.sum("n").alias("rows_rolled"))
    )
    run2 = man.commit_metrics("hourly", metrics2, key_col="source")
    assert run2 != run1
    assert man.todo(all_keys, "hourly", key_col="source").count() == 0

    # combined rows_rolled equals a single full run (no double work)
    full = decode_observations(seq).count()
    s = man.summary().filter("tier = 'hourly' AND status = 'done'").collect()[0]
    assert s["rows_rolled"] == full
    assert s["n_partitions"] == n_all


def test_failed_partitions_stay_todo(spark, tmp_path):
    man = CheckpointManifest(spark, str(tmp_path / "m2"))
    metrics = spark.createDataFrame(
        [("a", 10, "done"), ("b", 0, "failed")], "k string, rows_rolled long, st string"
    )
    man.commit_metrics("daily", metrics, key_col="k", status_col="st")
    all_keys = spark.createDataFrame([("a",), ("b",), ("c",)], "k string")
    todo = {r["k"] for r in man.todo(all_keys, "daily", key_col="k").collect()}
    assert todo == {"b", "c"}  # failed partitions are retried
