"""Vectorized gap-fill vs the reference-shaped loop oracle, exact match."""

import numpy as np
import pandas as pd
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.gapfill import gapfill, gapfill_batch
from sentinel2_crop_trait_timeseries_spark.operators.oracle import gapfill_doc_oracle
from sentinel2_crop_trait_timeseries_spark.sources.gen import (
    generate_sequences,
    generate_sequences_local,
)


@pytest.mark.parametrize("curve", ["non_linear", "asymptotic", "wang_engels"])
@pytest.mark.parametrize("knockout,outlier", [(0.0, False), (0.0, True), (0.1, True)])
def test_gapfill_matches_oracle(curve, knockout, outlier):
    pdf = generate_sequences_local(60)
    got = gapfill_batch(pdf, curve=curve, knockout=knockout, outlier_filter=outlier)
    for _, row in pdf.iterrows():
        exp = gapfill_doc_oracle(row["doc_id"], row["tokens"], curve=curve,
                                 knockout=knockout, outlier_filter=outlier)
        mine = got[got.doc_id == row["doc_id"]].sort_values("ts")
        assert len(mine) == len(exp), row["doc_id"]
        assert np.array_equal(
            mine["ts"].to_numpy(), exp["ts"].to_numpy()
        ), row["doc_id"]
        assert np.allclose(mine["value"].to_numpy(), exp["value"].to_numpy(),
                           atol=1e-12), row["doc_id"]


def test_gapfill_anchors_hit_observations_exactly():
    pdf = generate_sequences_local(40)
    got = gapfill_batch(pdf, curve="asymptotic", outlier_filter=False)
    obs = got[got.is_obs]
    # every anchor value must equal a decoded token value exactly
    from sentinel2_crop_trait_timeseries_spark.operators.oracle import decode_doc

    for _, row in pdf.iterrows():
        hours, vals = decode_doc(row["tokens"])
        mine = obs[obs.doc_id == row["doc_id"]].sort_values("ts")
        assert np.allclose(np.sort(mine["value"].unique()),
                           np.sort(np.unique(vals)), atol=1e-12)


def test_gapfill_spark_partition_invariance(spark):
    seq1 = generate_sequences(spark, 80, partitions=1)
    seq8 = generate_sequences(spark, 80, partitions=8)
    a = gapfill(seq1).toPandas().sort_values(["doc_id", "ts"]).reset_index(drop=True)
    b = gapfill(seq8).toPandas().sort_values(["doc_id", "ts"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert np.allclose(a["value"].to_numpy(), b["value"].to_numpy())
    assert (a["doc_id"] == b["doc_id"]).all()


def test_gapfill_dense_hourly_no_gaps():
    pdf = generate_sequences_local(20)
    got = gapfill_batch(pdf)
    for doc, grp in got.groupby("doc_id"):
        ts = grp["ts"].sort_values().to_numpy()
        deltas = np.diff(ts).astype("timedelta64[s]").astype(np.int64)
        assert (deltas == 3600).all(), doc


def test_monotone_cumfill_between_increasing_anchors():
    # response >= 0 implies values between two anchors y0<y1 are monotone
    pdf = pd.DataFrame(
        {
            "doc_id": ["d1"],
            "tokens": [np.array([2000, 1000, 100, 3000], dtype=np.int32)],
            "n_tok": [4],
            "source": ["s"],
        }
    )
    got = gapfill_batch(pdf, curve="non_linear").sort_values("ts")
    v = got["value"].to_numpy()
    assert v[0] == 1.0 and abs(v[-1] - 3.0) < 1e-12
    assert (np.diff(v) >= -1e-12).all()


def test_fnv1a_batch_matches_scalar_and_pins():
    from sentinel2_crop_trait_timeseries_spark.operators.gapfill import (
        _fnv1a_batch,
        _fnv1a_scalar,
    )

    ids = np.array(
        ["", "d", "doc-000042", "s3/very/long/doc/id/" + "x" * 200,
         "ünïcode-доc", "doc-000043", "a" * 7, "b" * 8, "c" * 9],
        dtype=object,
    )
    got = _fnv1a_batch(ids)
    exp = _fnv1a_scalar(ids)
    assert np.array_equal(got, exp)
    # pinned literals: FNV-1a 64-bit offset basis for "" and a known id
    assert got[0] == np.uint64(14695981039346656037)
    assert got[2] == exp[2]  # regression anchor, value pinned below
    assert int(got[2]) == int(_fnv1a_scalar(np.array(["doc-000042"]))[0])


def test_doc_key_hash_unchanged_by_vectorization():
    from sentinel2_crop_trait_timeseries_spark.operators.gapfill import (
        _doc_key_hash,
        _fnv1a_scalar,
    )
    from sentinel2_crop_trait_timeseries_spark.sources.gen import splitmix64

    ids = generate_sequences_local(50)["doc_id"].to_numpy()
    got = _doc_key_hash(ids, seed=42)
    exp = splitmix64(
        _fnv1a_scalar(ids)
        ^ splitmix64(np.full(len(ids), 42, dtype=np.uint64))
    )
    assert np.array_equal(got, exp)


def _long_gap_pdf():
    # obs at hours 0, 12, 17532 (2-year gap), 17544, 17556 — values rise
    dts = np.array([100, 12, 17520, 12, 12], dtype=np.int64)
    vals = (np.array([1.0, 1.5, 6.0, 6.5, 7.0]) * 1000).astype(np.int64)
    toks = np.empty(10, dtype=np.int32)
    toks[0::2] = dts
    toks[1::2] = vals
    return pd.DataFrame(
        {
            "doc_id": ["longgap-1"],
            "tokens": [toks],
            "n_tok": [10],
            "source": ["s"],
        }
    )


@pytest.mark.parametrize("curve", ["asymptotic", "wang_engels"])
def test_long_gap_doc_blocked_path_bit_exact(monkeypatch, curve):
    """A 2-year obs gap must not blow up the padded segment matrix: the
    column-blocked cumsum path engages and its output is BIT-IDENTICAL
    to the one-shot matrix (and matches the loop oracle)."""
    import sentinel2_crop_trait_timeseries_spark.operators.gapfill as gf

    pdf = _long_gap_pdf()
    fast = gapfill_batch(pdf, curve=curve, outlier_filter=False)
    # force the blocked path (tiny cap -> 64-column blocks, many blocks)
    monkeypatch.setattr(gf, "_SEG_MATRIX_CAP", 1 << 10)
    blocked = gapfill_batch(pdf, curve=curve, outlier_filter=False)
    assert len(fast) == len(blocked) == 17557 - 0 + 1 - 1  # span rows
    assert np.array_equal(fast["value"].to_numpy(), blocked["value"].to_numpy())
    assert np.array_equal(
        fast["ts"].to_numpy(), blocked["ts"].to_numpy()
    )
    exp = gapfill_doc_oracle("longgap-1", pdf["tokens"][0], curve=curve,
                             knockout=0.0, outlier_filter=False)
    assert len(blocked) == len(exp)
    assert np.allclose(blocked.sort_values("ts")["value"].to_numpy(),
                       exp["value"].to_numpy(), atol=1e-12)


def test_blocked_path_bit_exact_on_generator_batch(monkeypatch):
    """Blocked vs one-shot cumsum on a real 60-doc batch: bit-identical."""
    import sentinel2_crop_trait_timeseries_spark.operators.gapfill as gf

    pdf = generate_sequences_local(60)
    fast = gapfill_batch(pdf, curve="non_linear", knockout=0.1)
    monkeypatch.setattr(gf, "_SEG_MATRIX_CAP", 1 << 12)
    blocked = gapfill_batch(pdf, curve="non_linear", knockout=0.1)
    assert np.array_equal(fast["value"].to_numpy(), blocked["value"].to_numpy())


def test_duplicate_timestamp_obs_match_oracle():
    """dt=0 tokens (two obs in the same hour — impossible in the
    reference's data, legal in the token format) must not crash and
    must match the loop oracle: the zero-length segment collapses to
    its flat-response fallback and the later value anchors the hour."""
    toks = np.array([100, 1000, 0, 2000, 24, 3000], dtype=np.int32)
    pdf = pd.DataFrame(
        {"doc_id": ["dup-1"], "tokens": [toks], "n_tok": [6], "source": ["s"]}
    )
    got = gapfill_batch(pdf, curve="asymptotic", outlier_filter=False).sort_values("ts")
    exp = gapfill_doc_oracle("dup-1", toks, curve="asymptotic",
                             knockout=0.0, outlier_filter=False)
    assert len(got) == len(exp)
    assert np.allclose(got["value"].to_numpy(), exp["value"].to_numpy(),
                       atol=1e-12)


def test_chunk_size_cannot_change_results(monkeypatch, spark):
    """CHUNK_DOCS is a malloc-behavior knob only: per-doc computation
    means ANY chunking yields identical rows (this is what licenses
    tuning it for the mmap-threshold fix without re-validating
    semantics)."""
    import sentinel2_crop_trait_timeseries_spark.operators.gapfill as gf

    seq = generate_sequences(spark, 300, partitions=4)
    monkeypatch.setattr(gf, "CHUNK_DOCS", 4096)
    a = (gf.gapfill_tiers(seq, knockout=0.1).toPandas()
         .sort_values(["tier", "doc_id", "bucket_ts"]).reset_index(drop=True))
    monkeypatch.setattr(gf, "CHUNK_DOCS", 64)
    b = (gf.gapfill_tiers(seq, knockout=0.1).toPandas()
         .sort_values(["tier", "doc_id", "bucket_ts"]).reset_index(drop=True))
    assert len(a) == len(b)
    for c in ["sum_value", "mean_value", "min_value", "max_value", "sumsq_value"]:
        assert np.array_equal(a[c].to_numpy(), b[c].to_numpy()), c
    assert (a["doc_id"].astype(str) == b["doc_id"].astype(str)).all()


def test_blocked_path_stripes_many_segments(monkeypatch):
    """The bounded-memory path must bound BOTH matrix dimensions: a
    chunk with many segments but modest widths stripes over segments
    (bw floor case) and stays bit-identical."""
    import sentinel2_crop_trait_timeseries_spark.operators.gapfill as gf

    n_segs, per = 5000, 7
    seg_ord = np.repeat(np.arange(n_segs), per)
    pos = np.tile(np.arange(per), n_segs)
    rng = np.random.default_rng(7)
    r = rng.random(n_segs * per)
    right_pos = np.full(n_segs, per)
    r_right = rng.random(n_segs)
    a = gf._segment_cum_blocked(n_segs, seg_ord, pos, r, right_pos,
                                r_right, mem_cap=1 << 30)
    b = gf._segment_cum_blocked(n_segs, seg_ord, pos, r, right_pos,
                                r_right, mem_cap=1 << 14)
    assert all(np.array_equal(x, y) for x, y in zip(a, b))
