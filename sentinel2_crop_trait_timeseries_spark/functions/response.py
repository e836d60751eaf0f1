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

# Engine default parameters (rounded values of the reference's DAILY
# T_mean fits; kept verbatim for result compatibility across rounds)
PARAMS = {
    "non_linear": {"base_temp": -0.119, "slope": 0.00754},
    "asymptotic": {"c0": 2.163, "lrc": -7.393, "Asym": 14.945},
    "wang_engels": {"xmin": 3.156, "xopt": 24.284, "xmax": 25.943},
}

# Full-precision fitted parameters per covariate granularity, from the
# reference's parameter CSVs (/root/reference/data/dose_reponse_in-situ/
# output/parameter_model/<curve>/<curve>_granularity_<g>_parameter_T_mean.csv)
PARAMS_BY_GRANULARITY = {
    "hourly": {
        "non_linear": {"base_temp": 0.556847962136598, "slope": 0.00013682228024424},
        "asymptotic": {"c0": 4.1837162441442, "lrc": -11.2063343926512,
                       "Asym": 14.1977752161488},
        "wang_engels": {"xmin": 3.22246016395989, "xopt": 24.2736772635157,
                        "xmax": 24.3995243343857},
    },
    "daily": {
        "non_linear": {"base_temp": -0.119195572760026, "slope": 0.00753710959593614},
        "asymptotic": {"c0": 2.16255439789309, "lrc": -7.39297991895948,
                       "Asym": 14.9453457281692},
        "wang_engels": {"xmin": 3.15570825051186, "xopt": 24.283501748142,
                        "xmax": 25.9432175215174},
    },
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
    """Wang-Engels in the overflow-free normalized form
    y = t^alpha * (2 - t^alpha), t = (x-xmin)/(xopt-xmin).

    Mathematically identical to the reference's
    (2*xa^a*oa^a - xa^2a)/oa^2a (temperature_response.py:71-75), but
    that form overflows float64 when alpha is large: the reference's
    own HOURLY fit gives alpha ~ 116, where oa^2a ~ 9e307 and x within
    0.07 C of xmax makes xa^2a = inf -> the reference returns NaN/-inf
    there. The normalized form keeps t^alpha <= 2 over the support."""
    alpha = np.log(2.0) / np.log((xmax - xmin) / (xopt - xmin))
    inb = (x >= xmin) & (x <= xmax)
    t = np.where(inb, (x - xmin) / (xopt - xmin), 0.0)
    ta = t**alpha
    return np.where(inb, ta * (2.0 - ta), 0.0)


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
        # normalized overflow-free form; see wang_engels_np
        alpha = float(np.log(2.0) / np.log((p["xmax"] - p["xmin"]) / (p["xopt"] - p["xmin"])))
        t = (x - p["xmin"]) / (p["xopt"] - p["xmin"])
        ta = F.pow(t, alpha)
        return F.when(
            (x >= p["xmin"]) & (x <= p["xmax"]), ta * (F.lit(2.0) - ta)
        ).otherwise(0.0)
    raise ValueError(f"unknown response curve: {name}")
