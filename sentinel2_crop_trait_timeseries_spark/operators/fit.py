"""Per-doc non-linear least-squares sigmoid fit, batched inside Arrow.

The reference's baseline model fits a 4-parameter sigmoid per pixel with
``scipy.optimize.curve_fit`` in a Python loop
(/root/reference/src/baseline/01_run_baseline_model.py:28-79,260-290):

    y = L / (1 + exp(-k * (x - x0))) + b,   x = time normalized to [0,1]

This module is the engine's replacement. scipy is not assumed; instead a
**batched Levenberg-Marquardt** runs ALL docs of an Arrow batch
simultaneously: residuals/Jacobians are (n_docs, m_obs[, 4]) tensors and
the 4x4 normal equations solve with one ``np.linalg.solve`` over the
doc axis per iteration. No per-row Python, no per-doc Python — the
inner loop is O(iterations), not O(docs).

Failures (too few points, degenerate series, non-finite steps) never
raise: they are ledgered with status='failed' exactly like the
reference's failed_pixels.csv (:266-279), feeding the checkpoint
manifest (operators/manifest.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .gapfill import decode_batch

FIT_SCHEMA = (
    "source string, doc_id string, L double, k double, x0 double, b double, "
    "fit_rmse double, n_obs int, n_iter int, status string, seed_used int"
)

MIN_OBS = 5  # reference skips pixels with too few points


def _sigmoid(x, L, k, x0, b):
    return L / (1.0 + np.exp(-k * (x - x0))) + b


def lm_fit_sigmoid_batched(x: np.ndarray, y: np.ndarray, mask: np.ndarray,
                           max_iter: int = 60, tol: float = 1e-10):
    """Levenberg-Marquardt over a padded (n_docs, m) batch.

    x, y: padded observations; mask: True where real. Returns
    (params (n_docs, 4), rmse (n_docs,), n_iter (n_docs,), ok (n_docs,),
    seed_ok (n_docs,)) — seed_ok marks docs whose LM start WAS the
    closed-form logit solution; only for those is "LM RMSE <= logit
    RMSE" structural (accept-only-improving steps from that start).
    Docs seeded heuristically (flat range, ~zero logit slope) carry
    no such bound and consumers must not assert it.
    """
    n, m = x.shape
    cnt = mask.sum(axis=1).astype(np.float64)
    cnt_safe = np.maximum(cnt, 1.0)
    ymin = np.where(mask, y, np.inf).min(axis=1)
    ymax = np.where(mask, y, -np.inf).max(axis=1)
    # Initialize from the CLOSED-FORM LOGIT FIT where it exists (the
    # fit_sigmoid_logit construction: fixed asymptotes b=ymin-d,
    # L=range+2d with d=5% margin, z=logit((y-b)/L) regressed on x).
    # Starting AT the logit solution plus accept-only-improving steps
    # makes "LM RMSE <= logit RMSE" a structural guarantee — the
    # invariant the fit_sigmoid_events oracle pins — instead of an
    # empirical observation about a heuristic start. Degenerate docs
    # (flat range, ~zero slope) keep the range/slope heuristic.
    rng_y = ymax - ymin
    has_range = rng_y > 0
    d0 = 0.05 * rng_y + 1e-9
    b_lg = ymin - d0
    l_lg = rng_y + 2 * d0
    with np.errstate(all="ignore"):
        frac = (y - b_lg[:, None]) / l_lg[:, None]
        z = np.log(frac / (1.0 - frac))
        z = np.where(mask & has_range[:, None], z, 0.0)
        xm = np.where(mask, x, 0.0)
        sx = xm.sum(axis=1)
        sz = z.sum(axis=1)
        sxx = (xm * xm).sum(axis=1)
        sxz = (xm * z).sum(axis=1)
        den = sxx - sx * sx / cnt_safe
        k_lg = np.where(np.abs(den) > 1e-12, (sxz - sx * sz / cnt_safe)
                        / np.where(np.abs(den) > 1e-12, den, 1.0), 0.0)
        c_lg = (sz - k_lg * sx) / cnt_safe
        x0_lg = np.where(np.abs(k_lg) > 1e-9, -c_lg
                         / np.where(np.abs(k_lg) > 1e-9, k_lg, 1.0), 0.5)
    seed_ok = (
        has_range & (cnt >= MIN_OBS)
        & np.isfinite(k_lg) & np.isfinite(c_lg) & np.isfinite(x0_lg)
        & (np.abs(k_lg) > 1e-9)
    )
    p = np.stack(
        [
            np.where(seed_ok, l_lg, np.maximum(rng_y, 1e-3)),
            np.where(seed_ok, k_lg, 10.0),
            np.where(seed_ok, x0_lg, 0.5),
            np.where(seed_ok, b_lg, ymin),
        ],
        axis=1,
    )
    lam = np.full(n, 1e-3)
    active = cnt >= MIN_OBS
    n_iter = np.zeros(n, dtype=np.int64)

    def cost(params):
        L, k, x0, b = params.T
        r = np.where(mask, _sigmoid(x, L[:, None], k[:, None], x0[:, None], b[:, None]) - y, 0.0)
        return r, (r * r).sum(axis=1)

    r, c = cost(p)
    eye = np.eye(4)[None, :, :]
    for _ in range(max_iter):
        if not active.any():
            break
        L, k, x0, b = p.T
        e = np.exp(-k[:, None] * (x - x0[:, None]))
        s = 1.0 / (1.0 + e)
        # partials of sigmoid wrt L, k, x0, b
        dL = s
        common = L[:, None] * e * s * s
        dk = common * (x - x0[:, None])
        dx0 = -common * k[:, None]
        db = np.ones_like(x)
        J = np.stack([dL, dk, dx0, db], axis=2)
        J = np.where(mask[:, :, None], J, 0.0)
        JTJ = np.einsum("nmi,nmj->nij", J, J)
        JTr = np.einsum("nmi,nm->ni", J, r)
        A = JTJ + lam[:, None, None] * eye
        with np.errstate(all="ignore"):
            try:
                step = np.linalg.solve(A, -JTr[..., None])[..., 0]
            except np.linalg.LinAlgError:
                step = np.linalg.solve(
                    A + 1e-6 * eye, -JTr[..., None]
                )[..., 0]
        p_try = p + np.where(active[:, None], step, 0.0)
        r_try, c_try = cost(p_try)
        finite = np.isfinite(c_try)
        better = finite & (c_try < c) & active
        p = np.where(better[:, None], p_try, p)
        r = np.where(better[:, None], r_try, r)
        improved_by = np.where(better, c - c_try, 0.0)
        c = np.where(better, c_try, c)
        lam = np.where(better, lam * 0.3, np.where(active, lam * 4.0, lam))
        n_iter += active
        converged = better & (improved_by < tol * np.maximum(c, 1e-30))
        stuck = active & ~better & (lam > 1e8)
        active = active & ~converged & ~stuck
    rmse = np.sqrt(c / cnt_safe)
    ok = (cnt >= MIN_OBS) & np.isfinite(p).all(axis=1) & np.isfinite(rmse)
    return p, rmse, n_iter, ok, seed_ok


def fit_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    if len(pdf) == 0:
        return pd.DataFrame(
            {c: [] for c in ["source", "doc_id", "L", "k", "x0", "b",
                             "fit_rmse", "n_obs", "n_iter", "status",
                             "seed_used"]}
        )
    doc_of_obs, hours, vals, n_obs = decode_batch(pdf)
    n, m = len(pdf), int(n_obs.max()) if len(n_obs) else 0
    x = np.zeros((n, m))
    y = np.zeros((n, m))
    mask = np.zeros((n, m), dtype=bool)
    idx_in_doc = np.arange(len(doc_of_obs)) - np.repeat(
        np.concatenate(([0], np.cumsum(n_obs)[:-1])), n_obs
    )
    x[doc_of_obs, idx_in_doc] = hours
    y[doc_of_obs, idx_in_doc] = vals
    mask[doc_of_obs, idx_in_doc] = True
    # normalize time to [0,1] per doc (reference to_doy + minmax,
    # baseline/01_run_baseline_model.py:82-89,256-258)
    h_min = np.where(mask, x, np.inf).min(axis=1)
    h_max = np.where(mask, x, -np.inf).max(axis=1)
    span = np.maximum(h_max - h_min, 1.0)
    x = np.where(mask, (x - h_min[:, None]) / span[:, None], 0.0)

    p, rmse, n_iter, ok, seed_ok = lm_fit_sigmoid_batched(x, y, mask)
    return pd.DataFrame(
        {
            "source": pdf["source"].to_numpy(),
            "doc_id": pdf["doc_id"].to_numpy(),
            "L": p[:, 0],
            "k": p[:, 1],
            "x0": p[:, 2],
            "b": p[:, 3],
            "fit_rmse": rmse,
            "n_obs": n_obs.astype(np.int32),
            "n_iter": n_iter.astype(np.int32),
            "status": np.where(ok, "done", "failed"),
            "seed_used": seed_ok.astype(np.int32),
        }
    )


def fit_sigmoid(seq: DataFrame) -> DataFrame:
    """sequences -> per-doc sigmoid parameters + fit metrics.

    Narrow mapInPandas (no shuffle): each sequence row carries its whole
    series. Failed docs come back status='failed' — commit the result to
    the CheckpointManifest and only 'done' keys are skipped on resume.
    """

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield fit_batch(pdf)

    return seq.mapInPandas(fn, schema=FIT_SCHEMA)
