"""Global dose-response calibration recovers a known response curve
from synthetic observations."""

import numpy as np
import pandas as pd

from sentinel2_crop_trait_timeseries_spark.functions.response import (
    asymptotic_np,
    temperature_np,
)
from sentinel2_crop_trait_timeseries_spark.operators.calibrate import (
    _bin_centers,
    calibrate,
    segment_histograms,
)
from sentinel2_crop_trait_timeseries_spark.sources.gen import EPOCH_UNIX

TRUE = {"c0": 2.163, "lrc": -7.393, "Asym": 14.945}


def _make_obs(n_docs=120, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    t_lut = temperature_np(EPOCH_UNIX + np.arange(20000) * 3600.0)
    r_lut = asymptotic_np(t_lut, **TRUE)
    cum = np.concatenate(([0.0], np.cumsum(r_lut)))
    for d in range(n_docs):
        h = np.sort(rng.choice(np.arange(900, 4000), size=14, replace=False))
        v = 0.3 + (cum[h] - cum[h[0]])  # value = integral of true response
        for hh, vv in zip(h, v):
            rows.append(("s", f"d{d}", hh, vv))
    return pd.DataFrame(rows, columns=["source", "doc_id", "h", "value"])


def test_histogram_phase_alignment(spark):
    """The segment temperature histograms must be phase-aligned with the
    covariate LUT (anchored at EPOCH_UNIX): evaluating the TRUE response
    at the bin centers against the histograms must reproduce the
    observed deltas almost exactly (binning is the only error source).
    A phase shift of even a few hours makes this error explode (the
    pre-fix absolute-unix-hour indexing was off by 312 h / ~115%)."""
    from pyspark.sql import functions as F

    pdf = _make_obs(n_docs=40)
    obs = spark.createDataFrame(pdf).select(
        "source", "doc_id",
        F.timestamp_seconds(F.col("h") * 3600 + EPOCH_UNIX).alias("ts"),
        "value",
    )
    H, dv = segment_histograms(obs, max_segments=600)
    pred = H @ asymptotic_np(_bin_centers(), **TRUE)
    rel = float(np.linalg.norm(pred - dv) / np.linalg.norm(dv))
    assert rel < 0.02


def test_recovers_true_response_curve(spark):
    from pyspark.sql import functions as F

    pdf = _make_obs()
    obs = spark.createDataFrame(pdf).select(
        "source", "doc_id",
        F.timestamp_seconds(F.col("h") * 3600 + EPOCH_UNIX).alias("ts"),
        "value",
    )
    fit = calibrate(obs, n_reps=8)
    t = _bin_centers()
    truth = asymptotic_np(t, **TRUE)
    got = asymptotic_np(t, c0=fit["c0"], lrc=fit["lrc"], Asym=fit["Asym"])
    # parameters are sloppy (lrc/Asym trade off) — compare the CURVE
    scale = max(truth.max(), 1e-9)
    rel_rmse = float(np.sqrt(np.mean((got - truth) ** 2)) / scale)
    assert rel_rmse < 0.05
    # segment-delta reconstruction error, relative to delta spread
    # (bin discretization leaves a small floor)
    assert fit["rmse"] < 0.05 * float(pdf["value"].max())
