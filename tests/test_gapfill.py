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
