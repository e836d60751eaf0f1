"""Dose-response curves + deterministic covariate ("temperature") spine.

Semantics mirror the reference's temperature-response model family
(/root/reference/src/temperature_response.py):

- ``non_linear`` (broken stick): y = (x-base)*slope if x > base else 0
  (reference :16-29)
- ``asymptotic``: y = max(0, Asym*(1-exp(-exp(lrc)*(x-c0))))
  (reference :31-53)
- ``wang_engels``: alpha = ln2/ln((xmax-xmin)/(xopt-xmin));
  y = (2*(x-xmin)^a*(xopt-xmin)^a - (x-xmin)^(2a)) / (xopt-xmin)^(2a)
  for xmin <= x <= xmax else 0 (reference :55-79)

The reference applies wang_engels/non_linear per-scalar in a Python
loop (:81-87); here every curve is a vectorized numpy kernel (and an
equivalent Spark Column expression), so it runs either inside Arrow
batches or fully JVM-side. Default parameters are the reference's
fitted hourly T_mean parameters
(/root/reference/data/dose_reponse_in-situ/output/parameter_model/).

The covariate is a *function* of the timestamp, not a joined table:
a deterministic seasonal+diurnal temperature model. At 100 TB this
removes the meteo-join shuffle entirely; any real covariate table can
still be joined via a broadcast (it is tiny: one row per hour).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

# Fitted parameters from the reference (hourly granularity, T_mean)
PARAMS = {
    "non_linear": {"base_temp": -0.119, "slope": 0.00754},
    "asymptotic": {"c0": 2.163, "lrc": -7.393, "Asym": 14.945},
    "wang_engels": {"xmin": 3.156, "xopt": 24.284, "xmax": 25.943},
}

SECONDS_PER_HOUR = 3600
HOURS_PER_YEAR = 8760.0


# ---------------------------------------------------------------- numpy
def non_linear_np(x: np.ndarray, base_temp: float, slope: float) -> np.ndarray:
    return np.where(x > base_temp, (x - base_temp) * slope, 0.0)


def asymptotic_np(x: np.ndarray, c0: float, lrc: float, Asym: float) -> np.ndarray:
    y = Asym * (1.0 - np.exp(-np.exp(lrc) * (x - c0)))
    return np.where(y > 0.0, y, 0.0)


def wang_engels_np(x: np.ndarray, xmin: float, xopt: float, xmax: float) -> np.ndarray:
    alpha = np.log(2.0) / np.log((xmax - xmin) / (xopt - xmin))
    xa = np.where((x >= xmin) & (x <= xmax), x - xmin, 0.0)
    oa = (xopt - xmin) ** alpha
    y = (2.0 * xa**alpha * oa - xa ** (2.0 * alpha)) / oa**2
    return np.where((x >= xmin) & (x <= xmax), y, 0.0)


RESPONSE_NP = {
    "non_linear": non_linear_np,
    "asymptotic": asymptotic_np,
    "wang_engels": wang_engels_np,
}


def response_np(name: str, x: np.ndarray, params: dict | None = None) -> np.ndarray:
    return RESPONSE_NP[name](np.asarray(x, dtype=np.float64), **(params or PARAMS[name]))


def temperature_np(unix_seconds: np.ndarray) -> np.ndarray:
    """Deterministic covariate: seasonal + diurnal sinusoid, degrees C.

    T(t) = 10 + 12*sin(2*pi*(hoy/8760 - 0.25)) + 4*sin(2*pi*(hod/24 - 0.3))
    where hoy = hours since Jan 1 of the epoch year (continuous across
    years), hod = hour of day.
    """
    h = np.asarray(unix_seconds, dtype=np.float64) / SECONDS_PER_HOUR
    hoy = np.mod(h - 455832.0, HOURS_PER_YEAR)  # 455832 = hours 1970->2022-01-01
    hod = np.mod(h, 24.0)
    return (
        10.0
        + 12.0 * np.sin(2.0 * np.pi * (hoy / HOURS_PER_YEAR - 0.25))
        + 4.0 * np.sin(2.0 * np.pi * (hod / 24.0 - 0.3))
    )


# ---------------------------------------------------------------- Spark columns
def temperature_col(ts: Column) -> Column:
    """Spark-expression twin of ``temperature_np`` (JVM-side, codegen)."""
    h = F.unix_timestamp(ts) / SECONDS_PER_HOUR
    hoy = (h - F.lit(455832.0)) % F.lit(HOURS_PER_YEAR)
    hod = h % F.lit(24.0)
    two_pi = 2.0 * np.pi
    return (
        F.lit(10.0)
        + F.lit(12.0) * F.sin(F.lit(two_pi) * (hoy / HOURS_PER_YEAR - 0.25))
        + F.lit(4.0) * F.sin(F.lit(two_pi) * (hod / 24.0 - 0.3))
    )


def response_col(name: str, x: Column, params: dict | None = None) -> Column:
    p = params or PARAMS[name]
    if name == "non_linear":
        return F.when(x > p["base_temp"], (x - p["base_temp"]) * p["slope"]).otherwise(0.0)
    if name == "asymptotic":
        y = p["Asym"] * (F.lit(1.0) - F.exp(-np.exp(p["lrc"]) * (x - p["c0"])))
        return F.greatest(F.lit(0.0), y)
    if name == "wang_engels":
        alpha = float(np.log(2.0) / np.log((p["xmax"] - p["xmin"]) / (p["xopt"] - p["xmin"])))
        oa = float((p["xopt"] - p["xmin"]) ** alpha)
        xa = x - p["xmin"]
        y = (2.0 * F.pow(xa, alpha) * oa - F.pow(xa, 2.0 * alpha)) / (oa * oa)
        return F.when((x >= p["xmin"]) & (x <= p["xmax"]), y).otherwise(0.0)
    raise ValueError(f"unknown response curve: {name}")
