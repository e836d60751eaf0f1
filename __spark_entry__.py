"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship dose-response gap-fill on sf0.001;
``queries()`` / ``oracle_sql()`` expose the operator catalog from
``sentinel2_crop_trait_timeseries_spark.catalog`` (Spark DataFrame plans +
DuckDB oracle SQL).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["gapfill_dose_response"]["fn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec["fn"] for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: spec["sql"] for name, spec in QUERIES.items() if spec["sql"]
    }
