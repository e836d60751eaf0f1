"""Global dose-response parameter calibration (the reference's offline
R fitting pipeline, re-expressed Spark-first).

Reference procedure (/root/reference/src/scripts_dose_response/
01_dose_response_parameter_fitting.R:91-205 + functions/
FUN_dose_response_fitting.R:327-433): between each pair of consecutive
in-situ LAI ratings, the observed delta-LAI should equal the cumulative
dose-response of the covariate over that window; parameters are fitted
by minimizing the RMSE of that prediction, repeated 20x on 80%
subsamples, taking the median parameter vector.

Engine mapping:
- **Segment extraction is distributed**: consecutive-obs windows via a
  lag window function; each segment is reduced to a compact
  TEMPERATURE HISTOGRAM (the covariate takes <= 8760 distinct values a
  year; binned to 0.25 C ~ 200 bins). The fit objective
  sum_h f(T_h; theta) becomes a dot product histogram @ f(bins; theta),
  so candidate parameters are evaluated WITHOUT rescanning the data.
- **The fit itself is tiny** (n_segments x n_bins matrix, 3 params) and
  runs driver-side with the same batched Levenberg-Marquardt used for
  per-doc sigmoid fits — reps are rows of the batch, so the 20
  bootstrap repetitions fit SIMULTANEOUSLY (the reference parallelizes
  them across R processes; here they are one numpy solve).
- **Deterministic subsampling**: rep r keeps docs with
  splitmix64(doc_hash ^ r) % 10 < 8 — reproducible under any
  partitioning (the reference uses R's global RNG).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.response import temperature_np
from ..sources.gen import EPOCH_UNIX
from .gapfill import HOUR, HOURS_PER_PERIOD

N_BINS = 200
T_LO, T_HI = -25.0, 45.0


def _bin_edges():
    return np.linspace(T_LO, T_HI, N_BINS + 1)


def _bin_centers():
    e = _bin_edges()
    return (e[:-1] + e[1:]) / 2.0


def segment_histograms(obs: DataFrame, max_segments: int = 20000,
                       seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Distributed: consecutive-obs segments -> (histograms, dv).

    Returns a (n_seg, N_BINS) float64 matrix of temperature-bin hour
    counts and the observed value deltas. Sampling to max_segments is
    deterministic (hash of doc_id, segment index).
    """
    w = Window.partitionBy("source", "doc_id").orderBy("h")
    seg = (
        obs.select(
            "source", "doc_id",
            (F.unix_timestamp("ts") / HOUR).cast("long").alias("h"),
            "value",
        )
        .withColumn("h0", F.lag("h").over(w))
        .withColumn("v0", F.lag("value").over(w))
        .filter(F.col("h0").isNotNull() & (F.col("h") > F.col("h0")))
        .withColumn("dv", F.col("value") - F.col("v0"))
        .withColumn("rk", F.abs(F.hash("doc_id", "h0", F.lit(seed))) % 1000000)
    )
    rows = (
        seg.orderBy("rk")
        .limit(max_segments)
        .select("h0", "h", "dv")
        .collect()
    )
    # LUT of binned temperature per hour-of-period (tiny, driver-side)
    t_lut = temperature_np(EPOCH_UNIX + np.arange(HOURS_PER_PERIOD) * HOUR)
    bin_of_hour = np.clip(
        np.digitize(t_lut, _bin_edges()) - 1, 0, N_BINS - 1
    )
    # prefix counts per bin over one period -> O(1) histogram per segment
    onehot = np.zeros((HOURS_PER_PERIOD + 1, N_BINS))
    np.add.at(onehot, (np.arange(HOURS_PER_PERIOD) + 1, bin_of_hour), 1.0)
    prefix = np.cumsum(onehot, axis=0)
    period_total = prefix[-1]

    # the LUT above is anchored at EPOCH_UNIX: index 0 == the epoch hour.
    # Segment hours are ABSOLUTE unix hours, so the period phase must be
    # taken relative to the epoch hour (matching gapfill._response_lut's
    # hours-since-EPOCH indexing); using raw unix hours would phase-shift
    # every histogram by EPOCH_HOUR % HOURS_PER_PERIOD (~13 days).
    epoch_hour = EPOCH_UNIX // HOUR
    H = np.zeros((len(rows), N_BINS))
    dv = np.zeros(len(rows))
    for i, r in enumerate(rows):
        h0, h1 = int(r["h0"]), int(r["h"])
        a = (h0 - epoch_hour) % HOURS_PER_PERIOD
        span = h1 - h0
        b = a + span
        wraps, b_rem = divmod(b, HOURS_PER_PERIOD)
        hist = prefix[b_rem] - prefix[a] + wraps * period_total
        H[i] = hist
        dv[i] = r["dv"]
    return H, dv


def _asym_response_bins(theta: np.ndarray) -> np.ndarray:
    """Asymptotic response at bin centers for a (k, 3) parameter batch:
    max(0, Asym * (1 - exp(-exp(lrc) * (T - c0))))."""
    c0, lrc, asym = theta[:, 0:1], theta[:, 1:2], theta[:, 2:3]
    t = _bin_centers()[None, :]
    y = asym * (1.0 - np.exp(-np.exp(lrc) * (t - c0)))
    return np.maximum(y, 0.0)


def fit_dose_response(H: np.ndarray, dv: np.ndarray, n_reps: int = 20,
                      subsample: float = 0.8, seed: int = 42,
                      max_iter: int = 200) -> dict:
    """20 bootstrap reps x 80% subsample, all reps fitted simultaneously
    with damped Gauss-Newton on the histogram objective; median params.

    Returns {"c0", "lrc", "Asym", "rmse", "params_per_rep"}.
    """
    rng_idx = np.arange(len(dv))
    keep = np.empty((n_reps, len(dv)), dtype=bool)
    for r in range(n_reps):
        # deterministic per-rep subsample
        h = (rng_idx * 2654435761 + (seed + r) * 40503) % 1000
        keep[r] = h < int(subsample * 1000)

    theta = np.tile(np.array([[2.0, -7.0, 10.0]]), (n_reps, 1))
    lam = np.full(n_reps, 1e-2)

    def residuals(th):
        f = _asym_response_bins(th)            # (k, bins)
        pred = f @ H.T                          # (k, nseg)
        res = np.where(keep, pred - dv[None, :], 0.0)
        return res, (res * res).sum(axis=1)

    res, cost = residuals(theta)
    eps = 1e-6
    for _ in range(max_iter):
        J = np.empty((n_reps, len(dv), 3))
        for p in range(3):
            tp = theta.copy()
            tp[:, p] += eps
            rp, _ = residuals(tp)
            J[:, :, p] = (rp - res) / eps
        JTJ = np.einsum("kni,knj->kij", J, J)
        JTr = np.einsum("kni,kn->ki", J, res)
        A = JTJ + lam[:, None, None] * np.eye(3)[None]
        try:
            step = np.linalg.solve(A, -JTr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            step = np.linalg.solve(A + 1e-3 * np.eye(3)[None], -JTr[..., None])[..., 0]
        t_try = theta + step
        r_try, c_try = residuals(t_try)
        better = np.isfinite(c_try) & (c_try < cost)
        theta = np.where(better[:, None], t_try, theta)
        res = np.where(better[:, None], r_try, res)
        cost = np.where(better, c_try, cost)
        lam = np.where(better, lam * 0.5, lam * 3.0)
        if (np.abs(step).max(axis=1) < 1e-10).all():
            break

    med = np.median(theta, axis=0)  # reference: median across reps
    n_used = keep.sum(axis=1)
    rmse = float(np.median(np.sqrt(cost / np.maximum(n_used, 1))))
    return {
        "c0": float(med[0]),
        "lrc": float(med[1]),
        "Asym": float(med[2]),
        "rmse": rmse,
        "params_per_rep": theta,
    }


def calibrate(obs: DataFrame, n_reps: int = 20, subsample: float = 0.8,
              max_segments: int = 20000, seed: int = 42) -> dict:
    """End-to-end: distributed segment histograms + simultaneous
    bootstrap fits -> median asymptotic dose-response parameters."""
    H, dv = segment_histograms(obs, max_segments=max_segments, seed=seed)
    return fit_dose_response(H, dv, n_reps=n_reps, subsample=subsample, seed=seed)
