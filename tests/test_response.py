"""Response-curve kernels: golden values, boundaries, Spark-expr parity."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.functions.response import (
    PARAMS,
    asymptotic_np,
    non_linear_np,
    response_col,
    response_np,
    temperature_col,
    temperature_np,
    wang_engels_np,
)


def test_non_linear_broken_stick():
    p = PARAMS["non_linear"]
    x = np.array([p["base_temp"] - 1, p["base_temp"], p["base_temp"] + 10])
    y = non_linear_np(x, **p)
    assert y[0] == 0.0 and y[1] == 0.0
    assert np.isclose(y[2], 10 * p["slope"])


def test_asymptotic_clamped_nonnegative():
    p = PARAMS["asymptotic"]
    y = asymptotic_np(np.array([-40.0, p["c0"], 25.0]), **p)
    assert (y >= 0).all()
    assert y[1] == 0.0  # zero exactly at c0
    assert y[2] > 0


def test_wang_engels_support_and_peak():
    p = PARAMS["wang_engels"]
    x = np.array([p["xmin"] - 1, p["xmin"], p["xopt"], p["xmax"], p["xmax"] + 1])
    y = wang_engels_np(x, **p)
    assert y[0] == 0.0 and y[4] == 0.0  # outside support -> 0
    assert y[1] == 0.0
    assert np.isclose(y[2], 1.0)  # normalized peak at xopt
    assert y[3] >= 0.0


def test_temperature_deterministic_seasonal():
    t_summer = temperature_np(np.array([1656676800.0]))  # 2022-07-01 12:00
    t_winter = temperature_np(np.array([1641038400.0]))  # 2022-01-01 12:00
    assert t_summer[0] > t_winter[0]


@pytest.mark.parametrize("curve", ["non_linear", "asymptotic", "wang_engels"])
def test_spark_expr_matches_numpy(spark, curve):
    ts = pd.date_range("2022-03-01", "2022-09-01", freq="17h")
    pdf = pd.DataFrame({"ts": ts})
    sdf = spark.createDataFrame(pdf)
    out = (
        sdf.select(
            temperature_col(F.col("ts")).alias("t"),
            response_col(curve, temperature_col(F.col("ts"))).alias("r"),
        )
        .toPandas()
    )
    secs = ts.astype("int64").to_numpy() / 1e9
    t_np = temperature_np(secs)
    r_np = response_np(curve, t_np)
    assert np.allclose(out["t"].to_numpy(), t_np, atol=1e-9)
    assert np.allclose(out["r"].to_numpy(), r_np, atol=1e-9)
