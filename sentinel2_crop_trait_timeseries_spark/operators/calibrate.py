"""Global dose-response parameter calibration (the reference's offline
R fitting pipeline, re-expressed Spark-first).

Reference procedure (/root/reference/src/scripts_dose_response/
01_dose_response_parameter_fitting.R:91-205 + functions/
FUN_dose_response_fitting.R:327-433): between each pair of consecutive
in-situ LAI ratings, the observed delta-LAI should equal the cumulative
dose-response of the covariate over that window; parameters are fitted
by minimizing the RMSE of that prediction, repeated 20x on 80%
subsamples, taking the median parameter vector.

Engine mapping — FULLY DISTRIBUTED, no per-segment driver collect:
- Each consecutive-obs segment reduces to a TEMPERATURE HISTOGRAM
  (<=200 bins of 0.25C) via an O(1) periodic prefix-sum lookup, so the
  fit objective sum_i (f(bins;theta) @ H_i - dv_i)^2 is LINEAR in the
  histograms. That means the whole objective is determined by per-rep
  SUFFICIENT STATISTICS: G_r = sum w_ri H_i H_i^T (200x200),
  c_r = sum w_ri dv_i H_i, d_r = sum w_ri dv_i^2, n_r = sum w_ri —
  computed as one narrow mapInPandas + a bounded (reps x 40k-entry)
  aggregation. The shuffle volume is INDEPENDENT of the number of
  segments: no 20k cap, no statistical compromise at scale.
- The Gauss-Newton fit then runs driver-side on the statistics alone:
  cost_r(theta) = f G_r f^T - 2 c_r.f + d_r,
  J^T J = B G B^T and J^T r = B (G f - c) with B = df/dtheta — the
  SAME Levenberg-Marquardt math as a per-residual fit, all 20
  bootstrap repetitions solved simultaneously (the reference
  parallelizes them across R processes).
- Deterministic subsampling: rep r keeps segments with
  splitmix64(segment_key ^ splitmix64(seed + r)) % 1000 <
  subsample*1000 — keyed on (doc_id, h0), reproducible under ANY
  partitioning or segment count (the reference uses R's global RNG).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.response import temperature_np
from ..sources.gen import EPOCH_UNIX, splitmix64
from .gapfill import HOUR, HOURS_PER_PERIOD, _doc_key_hash

N_BINS = 200
T_LO, T_HI = -25.0, 45.0


def _bin_edges():
    return np.linspace(T_LO, T_HI, N_BINS + 1)


def _bin_centers():
    e = _bin_edges()
    return (e[:-1] + e[1:]) / 2.0


def _prefix_matrix() -> tuple[np.ndarray, np.ndarray]:
    """(prefix, period_total): prefix[i] = per-bin hour counts over the
    first i hours of one covariate period, anchored at EPOCH_UNIX —
    histograms of arbitrary hour windows are O(1) differences."""
    t_lut = temperature_np(EPOCH_UNIX + np.arange(HOURS_PER_PERIOD) * HOUR)
    bin_of_hour = np.clip(np.digitize(t_lut, _bin_edges()) - 1, 0, N_BINS - 1)
    onehot = np.zeros((HOURS_PER_PERIOD + 1, N_BINS))
    np.add.at(onehot, (np.arange(HOURS_PER_PERIOD) + 1, bin_of_hour), 1.0)
    prefix = np.cumsum(onehot, axis=0)
    return prefix, prefix[-1]


def _segments(obs: DataFrame) -> DataFrame:
    """Distributed consecutive-obs segments: (doc_id, h0, h1, dv)."""
    w = Window.partitionBy("source", "doc_id").orderBy("h")
    return (
        obs.select(
            "source", "doc_id",
            (F.unix_timestamp("ts") / HOUR).cast("long").alias("h"),
            "value",
        )
        .withColumn("h0", F.lag("h").over(w))
        .withColumn("v0", F.lag("value").over(w))
        .filter(F.col("h0").isNotNull() & (F.col("h") > F.col("h0")))
        .select(
            "doc_id", "h0", F.col("h").alias("h1"),
            (F.col("value") - F.col("v0")).alias("dv"),
        )
    )


def _hist_batch(h0: np.ndarray, h1: np.ndarray, prefix: np.ndarray,
                period_total: np.ndarray) -> np.ndarray:
    """Vectorized per-segment temperature histograms.

    The LUT is anchored at EPOCH_UNIX (index 0 == the epoch hour), so
    the period phase is taken relative to the epoch hour — raw unix
    hours would phase-shift every histogram by
    EPOCH_HOUR % HOURS_PER_PERIOD (~13 days)."""
    epoch_hour = EPOCH_UNIX // HOUR
    a = (h0 - epoch_hour) % HOURS_PER_PERIOD
    span = h1 - h0
    b = a + span
    wraps, b_rem = np.divmod(b, HOURS_PER_PERIOD)
    return prefix[b_rem] - prefix[a] + wraps[:, None] * period_total[None, :]


def sufficient_stats(obs: DataFrame, n_reps: int = 20,
                     subsample: float = 0.8, seed: int = 42):
    """Distributed (G, c, d, n) per bootstrap rep.

    Returns G (n_reps, N_BINS, N_BINS), c (n_reps, N_BINS),
    d (n_reps,), n (n_reps,). One keyed shuffle (the lag window), one
    narrow mapInPandas emitting per-batch partials, and one
    (rep, idx)-keyed aggregation whose size is independent of the
    segment count."""
    seg = _segments(obs)
    prefix, period_total = _prefix_matrix()
    thresh = np.uint64(int(subsample * 1000))
    rep_salt = splitmix64(np.arange(n_reps, dtype=np.uint64)
                          + np.uint64(seed))
    width = N_BINS * N_BINS + N_BINS + 2  # G_flat + c + d + n

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                continue
            h0 = pdf["h0"].to_numpy(dtype=np.int64)
            h1 = pdf["h1"].to_numpy(dtype=np.int64)
            dv = pdf["dv"].to_numpy(dtype=np.float64)
            H = _hist_batch(h0, h1, prefix, period_total)
            seg_key = splitmix64(
                _doc_key_hash(pdf["doc_id"].to_numpy(), seed)
                ^ splitmix64(h0.astype(np.uint64))
            )
            # keep mask (n_reps, n_seg)
            keep = (
                splitmix64(seg_key[None, :] ^ rep_salt[:, None])
                % np.uint64(1000)
            ) < thresh
            rows = []
            for r in range(n_reps):
                w = keep[r]
                Hw = H[w]
                dvw = dv[w]
                G = Hw.T @ Hw
                c = Hw.T @ dvw
                payload = np.concatenate(
                    [G.ravel(), c, [float(dvw @ dvw)], [float(w.sum())]]
                )
                rows.append((r, payload))
            out = pd.DataFrame(rows, columns=["rep", "payload"])
            yield out

    partials = seg.mapInPandas(kernel, schema="rep int, payload array<double>")
    summed = (
        partials.select("rep", F.posexplode("payload").alias("idx", "v"))
        .groupBy("rep", "idx")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    flat = np.zeros((n_reps, width))
    for row in summed:
        flat[row["rep"], row["idx"]] = row["s"]
    G = flat[:, : N_BINS * N_BINS].reshape(n_reps, N_BINS, N_BINS)
    c = flat[:, N_BINS * N_BINS: N_BINS * N_BINS + N_BINS]
    d = flat[:, -2]
    n = flat[:, -1]
    return G, c, d, n


def segment_histograms(obs: DataFrame, max_segments: int = 20000,
                       seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment histograms + deltas, collected (TEST/DEBUG utility —
    calibrate() itself never materializes per-segment rows; see
    sufficient_stats). Sampling to max_segments is deterministic."""
    seg = _segments(obs).withColumn(
        "rk", F.abs(F.hash("doc_id", "h0", F.lit(seed))) % 1000000
    )
    rows = seg.orderBy("rk").limit(max_segments).select("h0", "h1", "dv").collect()
    prefix, period_total = _prefix_matrix()
    h0 = np.array([r["h0"] for r in rows], dtype=np.int64)
    h1 = np.array([r["h1"] for r in rows], dtype=np.int64)
    dv = np.array([r["dv"] for r in rows], dtype=np.float64)
    if len(rows) == 0:
        return np.zeros((0, N_BINS)), dv
    return _hist_batch(h0, h1, prefix, period_total), dv


def _asym_response_bins(theta: np.ndarray) -> np.ndarray:
    """Asymptotic response at bin centers for a (k, 3) parameter batch:
    max(0, Asym * (1 - exp(-exp(lrc) * (T - c0))))."""
    c0, lrc, asym = theta[:, 0:1], theta[:, 1:2], theta[:, 2:3]
    t = _bin_centers()[None, :]
    y = asym * (1.0 - np.exp(-np.exp(lrc) * (t - c0)))
    return np.maximum(y, 0.0)


def fit_dose_response_stats(G: np.ndarray, c: np.ndarray, d: np.ndarray,
                            n: np.ndarray, max_iter: int = 200) -> dict:
    """Damped Gauss-Newton on the sufficient-statistics objective
    cost_r(theta) = f G_r f - 2 c_r.f + d_r, all reps simultaneously;
    median params across reps (the reference's aggregation)."""
    n_reps = len(d)
    theta = np.tile(np.array([[2.0, -7.0, 10.0]]), (n_reps, 1))
    lam = np.full(n_reps, 1e-2)

    def cost_of(th):
        f = _asym_response_bins(th)  # (k, bins)
        quad = np.einsum("kb,kbc,kc->k", f, G, f)
        lin = np.einsum("kb,kb->k", c, f)
        return f, quad - 2.0 * lin + d

    f, cost = cost_of(theta)
    eps = 1e-6
    for _ in range(max_iter):
        B = np.empty((n_reps, 3, N_BINS))
        for p in range(3):
            tp = theta.copy()
            tp[:, p] += eps
            B[:, p, :] = (_asym_response_bins(tp) - f) / eps
        Gf = np.einsum("kbc,kc->kb", G, f)
        JTr = np.einsum("kpb,kb->kp", B, Gf - c)
        JTJ = np.einsum("kpb,kbc,kqc->kpq", B, G, B)
        A = JTJ + lam[:, None, None] * np.eye(3)[None]
        try:
            step = np.linalg.solve(A, -JTr[..., None])[..., 0]
        except np.linalg.LinAlgError:
            step = np.linalg.solve(A + 1e-3 * np.eye(3)[None], -JTr[..., None])[..., 0]
        t_try = theta + step
        f_try, c_try = cost_of(t_try)
        better = np.isfinite(c_try) & (c_try < cost)
        theta = np.where(better[:, None], t_try, theta)
        f = np.where(better[:, None], f_try, f)
        cost = np.where(better, c_try, cost)
        lam = np.where(better, lam * 0.5, lam * 3.0)
        if (np.abs(step).max(axis=1) < 1e-10).all():
            break

    med = np.median(theta, axis=0)  # reference: median across reps
    # cost is a difference of large quadratics; clamp fp residue
    rmse = float(np.median(np.sqrt(np.maximum(cost, 0.0) / np.maximum(n, 1))))
    return {
        "c0": float(med[0]),
        "lrc": float(med[1]),
        "Asym": float(med[2]),
        "rmse": rmse,
        "params_per_rep": theta,
    }


def calibrate(obs: DataFrame, n_reps: int = 20, subsample: float = 0.8,
              seed: int = 42) -> dict:
    """End-to-end: distributed sufficient statistics (uncapped — scales
    to any segment count) + simultaneous bootstrap fits -> median
    asymptotic dose-response parameters."""
    G, c, d, n = sufficient_stats(obs, n_reps=n_reps, subsample=subsample,
                                  seed=seed)
    return fit_dose_response_stats(G, c, d, n)
