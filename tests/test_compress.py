"""Gorilla codec: round-trip exactness + compression ratio + Spark
segment operators (encode via applyInPandas, decode via mapInPandas)."""

import numpy as np
import pandas as pd
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.compress import (
    compress_segments,
    decompress_segments,
    gorilla_decode,
    gorilla_encode,
)


def _roundtrip(ts, vals):
    blob = gorilla_encode(ts, vals)
    ts2, v2 = gorilla_decode(blob)
    np.testing.assert_array_equal(np.asarray(ts, dtype=np.int64), ts2)
    np.testing.assert_array_equal(
        np.asarray(vals, dtype=np.float64).view(np.uint64), v2.view(np.uint64)
    )
    return blob


def test_roundtrip_regular_hourly():
    ts = 1640995200 + 3600 * np.arange(2000)
    vals = 5 + np.sin(np.arange(2000) / 24.0)
    blob = _roundtrip(ts, vals)
    ratio = 16 * len(ts) / len(blob)
    assert ratio > 1.5  # regular deltas compress to ~1 bit each


def test_roundtrip_irregular_and_edge_cases():
    _roundtrip([], [])
    _roundtrip([1640995200], [3.14])
    _roundtrip([0, 1], [0.0, 0.0])
    # irregular gaps incl. a 1-year jump, dod=0 runs, negative dods
    ts = [0, 86400, 86400 * 2, 86400 * 3, 86400 * 400, 86400 * 400 + 1]
    vals = [1.0, 1.0, -2.5, float("nan"), 1e300, -1e-300]
    _roundtrip(ts, vals)


def test_roundtrip_constant_values_max_compression():
    ts = 1640995200 + 3600 * np.arange(1000)
    vals = np.full(1000, 7.25)
    blob = _roundtrip(ts, vals)
    # constant value + constant delta: ~2 bits/point after the header
    assert len(blob) < 20 + 1000 // 3


def test_roundtrip_random_fuzz():
    rng = np.random.default_rng(42)
    for trial in range(25):
        n = int(rng.integers(2, 300))
        ts = np.cumsum(rng.integers(0, 10**6, size=n)).astype(np.int64)
        vals = rng.choice(
            [0.0, 1.5, -1.5, 3.14159, 1e300, -1e-300, np.inf],
            size=n,
        ) + rng.normal(0, 1, size=n) * rng.integers(0, 2, size=n)
        _roundtrip(ts, vals)


@pytest.mark.usefixtures("spark")
def test_spark_segment_roundtrip(spark):
    pdf = pd.DataFrame(
        {
            "source": ["a"] * 50 + ["b"] * 30,
            "doc_id": ["d1"] * 25 + ["d2"] * 25 + ["d3"] * 30,
            "ts": pd.to_datetime(1640995200 + 3600 * np.arange(80), unit="s"),
            "value": np.linspace(0, 7, 80),
        }
    )
    df = spark.createDataFrame(pdf)
    seg = compress_segments(df)
    segs = seg.collect()
    assert {(r["source"], r["doc_id"]) for r in segs} == {
        ("a", "d1"), ("a", "d2"), ("b", "d3")
    }
    assert all(r["compression_ratio"] > 1 for r in segs)
    back = decompress_segments(seg).select("source", "doc_id", "ts", "value")
    orig = df.select("source", "doc_id", "ts", "value")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


@pytest.mark.usefixtures("spark")
def test_spark_quantized_segments(spark):
    """value_grid mode end-to-end: decoded values are EXACTLY the
    1/512-grid snap of the originals (bit-level, via the Spark ops),
    every point within 2^-10, and a smooth series compresses strictly
    better than lossless."""
    step = 1 / 512.0
    n = 600
    vals = 5 + np.sin(np.arange(n) / 24.0) * 2.0
    pdf = pd.DataFrame(
        {
            "source": ["s"] * n,
            "doc_id": ["d"] * n,
            "ts": pd.to_datetime(1640995200 + 3600 * np.arange(n), unit="s"),
            "value": vals,
        }
    )
    df = spark.createDataFrame(pdf)
    seg_q = compress_segments(df, value_grid=step)
    seg_l = compress_segments(df)
    enc_q = seg_q.collect()[0]
    enc_l = seg_l.collect()[0]
    assert enc_q["enc_bytes"] < enc_l["enc_bytes"]
    back = (
        decompress_segments(seg_q)
        .orderBy("ts")
        .select("value")
        .toPandas()["value"]
        .to_numpy()
    )
    snapped = np.floor(vals / step + 0.5) * step
    np.testing.assert_array_equal(back.view(np.uint64), snapped.view(np.uint64))
    assert np.max(np.abs(back - vals)) <= step / 2
