"""Table I/O seam: parquet fallback round-trip; Iceberg gated off here."""

from sentinel2_crop_trait_timeseries_spark.sources.table_io import (
    iceberg_enabled,
    read_table,
    write_table,
)
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences


def test_parquet_fallback_roundtrip(spark, tmp_path):
    assert not iceberg_enabled(spark)  # no Iceberg jars in this container
    seq = generate_sequences(spark, 20, partitions=2)
    path = str(tmp_path / "seq")
    write_table(seq, path, partition_by=["source"])
    back = read_table(spark, path)
    assert back.count() == 20
    assert set(back.columns) == {"doc_id", "tokens", "n_tok", "source"}


import glob
import os
import subprocess
import sys

import pyspark
import pytest

# An Iceberg runtime jar can arrive either in pyspark's bundled jars dir
# or via $ICEBERG_JAR. Absent both (this container), the test SKIPS —
# the seam's Iceberg branch is exercised the day a runtime exists.
_ICEBERG_JARS = glob.glob(
    os.path.join(os.path.dirname(pyspark.__file__), "jars",
                 "iceberg-spark-runtime*.jar")
) + ([os.environ["ICEBERG_JAR"]] if os.environ.get("ICEBERG_JAR") else [])


@pytest.mark.skipif(
    not _ICEBERG_JARS, reason="no Iceberg runtime jar in this container"
)
def test_iceberg_roundtrip_when_jar_present(tmp_path):
    """Round-trip write_table/read_table through a local Iceberg hadoop
    catalog (subprocess: the extension must be set before JVM start,
    which the shared session fixture can't provide)."""
    script = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from sentinel2_crop_trait_timeseries_spark.session import get_spark
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences
from sentinel2_crop_trait_timeseries_spark.sources.table_io import (
    read_table, write_table, iceberg_enabled)
spark = get_spark(master="local[2]", extra_conf={{
    "spark.jars": {_ICEBERG_JARS[0] if _ICEBERG_JARS else ''!r},
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.lake": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.lake.type": "hadoop",
    "spark.sql.catalog.lake.warehouse": "file://{tmp_path}/warehouse",
}})
assert iceberg_enabled(spark)
seq = generate_sequences(spark, 20, partitions=2)
write_table(seq, "lake.db.seq")
assert read_table(spark, "lake.db.seq").count() == 20
write_table(seq, "lake.db.seq", mode="append")
assert read_table(spark, "lake.db.seq").count() == 40
print("ICEBERG_OK")
"""
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True
    )
    assert "ICEBERG_OK" in res.stdout, res.stderr[-2000:]
