"""Error-statistics aggregate bundle as composable Column expressions.

One-pass equivalents of the reference's ``calculate_error_stats``
(/root/reference/src/validation/utils.py:15-77): RMSE, MAE, MAPE, bias,
R^2 (as squared Pearson corr), nRMSE/nMAE/nMAPE, NMAD, OLS slope and
intercept. All built-ins (corr / regr_slope / regr_intercept / exact
percentile), so the whole bundle is a single whole-stage-codegen
aggregate with map-side partial aggregation — no UDF, no second pass.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def error_stats_exprs(obs: Column | str, pred: Column | str) -> list[Column]:
    o = F.col(obs) if isinstance(obs, str) else obs
    p = F.col(pred) if isinstance(pred, str) else pred
    err = p - o
    rmse = F.sqrt(F.avg(err * err))
    mae = F.avg(F.abs(err))
    mean_obs = F.avg(o)
    return [
        F.count(o).alias("n"),
        rmse.alias("rmse"),
        mae.alias("mae"),
        F.avg(err).alias("bias"),
        F.avg(F.abs(err) / F.abs(o)).alias("mape"),
        (rmse / mean_obs).alias("nrmse"),
        (mae / mean_obs).alias("nmae"),
        (F.lit(1.4826) * F.percentile(F.abs(err), F.lit(0.5))).alias("nmad"),
        F.pow(F.corr(o, p), F.lit(2.0)).alias("r2"),
        F.regr_slope(p, o).alias("slope"),
        F.regr_intercept(p, o).alias("intercept"),
    ]
