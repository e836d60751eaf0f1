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
