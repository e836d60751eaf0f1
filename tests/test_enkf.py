"""EnKF assimilation: shrinkage toward obs, determinism, invariance."""

import numpy as np
import pandas as pd
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.enkf import (
    enkf_assimilate,
    enkf_batch,
)
from sentinel2_crop_trait_timeseries_spark.sources.gen import (
    gen_batch,
    generate_sequences,
)


@pytest.fixture(scope="module")
def pdf():
    return gen_batch(np.arange(200))


def test_tight_obs_tracks_measurements(pdf):
    # Kalman gain K = P/(P+R) -> 1 needs ensemble spread P >> obs noise
    # R: large process noise + near-zero obs uncertainty collapses the
    # analysis onto the measurements (the reference's regime when
    # lai_uncertainty is small relative to process_uncertainty)
    res = enkf_batch(pdf, obs_unc=1e-5, proc_unc=2.0)
    later = res[res["pos"] > 0]
    err = np.abs(later["assim_mean"] - later["value"])
    assert np.quantile(err, 0.95) < 0.1
    assert (res["assim_std"] >= 0).all()


def test_collapsed_ensemble_keeps_forecast_weight(pdf):
    # with proc_unc=0 the forecast ensemble collapses (P ~ R), so the
    # analysis stays between forecast and observation: the growth-clock
    # drift (cum response between obs) must push assim_mean above the
    # raw values on average — the reference's drift that its diff>=0
    # filter + segment rescale absorb downstream
    res = enkf_batch(pdf, obs_unc=1e-4, proc_unc=0.0)
    later = res[res["pos"] > 0]
    assert (later["assim_mean"] >= later["value"] - 1e-6).mean() > 0.95
    assert later["assim_std"].max() < 1.0  # collapsed spread stays tiny


def test_deterministic_and_chunk_independent(pdf):
    a = enkf_batch(pdf)
    b = enkf_batch(pdf)
    pd.testing.assert_frame_equal(a, b)
    # doc-keyed RNG: processing docs in two halves gives identical rows
    h1 = enkf_batch(pdf.iloc[:100])
    h2 = enkf_batch(pdf.iloc[100:].reset_index(drop=True))
    merged = (
        pd.concat([h1, h2], ignore_index=True)
        .sort_values(["doc_id", "pos"])
        .reset_index(drop=True)
    )
    full = a.sort_values(["doc_id", "pos"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(merged, full)


def test_spark_partition_invariance(spark):
    seq = generate_sequences(spark, 100, partitions=3).cache()
    a = enkf_assimilate(seq.repartition(1)).orderBy("doc_id", "pos").collect()
    b = enkf_assimilate(seq.repartition(5)).orderBy("doc_id", "pos").collect()
    assert a == b
    assert len(a) > 1000


def test_reconstruct_assimilated_dense_and_tiers(spark):
    from sentinel2_crop_trait_timeseries_spark.operators.enkf import (
        reconstruct_assimilated,
    )

    seq = generate_sequences(spark, 60, partitions=3).cache()
    dense = reconstruct_assimilated(seq).toPandas()
    assert len(dense) > 10000
    assert np.isfinite(dense["value"]).all()
    # anchor count per doc matches an independent recomputation of the
    # reference's SINGLE-PASS diff>=0 filter (vs immediate predecessor,
    # not vs last survivor), with diff forced to 0 for the FIRST and
    # LAST measurement point so both endpoints are always retained
    # (04_reconstruct_s2_traits.py:480-502)
    from sentinel2_crop_trait_timeseries_spark.operators.enkf import (
        enkf_assimilate,
    )

    res = enkf_assimilate(seq).toPandas().sort_values(["doc_id", "pos"])
    prev = res.groupby("doc_id")["assim_mean"].shift()
    last_pos = res.groupby("doc_id")["pos"].transform("max")
    keep = (
        res["pos"].eq(0)
        | res["pos"].eq(last_pos)
        | (res["assim_mean"] - prev >= 0)
    )
    want_counts = res[keep].groupby("doc_id").size()
    got_counts = dense[dense["is_obs"]].groupby("doc_id").size()
    assert got_counts.sort_index().equals(want_counts.sort_index())
    assert keep.sum() < len(res)  # the filter actually dropped something

    tiers = reconstruct_assimilated(seq, tiers=True)
    assert tiers.filter("tier = 'weekly'").count() > 0
    plan = tiers._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # still a pure narrow pipeline

    a = reconstruct_assimilated(seq.repartition(1)).orderBy("doc_id", "ts")
    b = reconstruct_assimilated(seq.repartition(6)).orderBy("doc_id", "ts")
    assert a.collect() == b.collect()
