"""Fused shuffle-free gapfill_tiers == cascade(gapfill(...)), and is
invariant under repartitioning."""

import numpy as np
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.gapfill import (
    gapfill,
    gapfill_tiers,
)
from sentinel2_crop_trait_timeseries_spark.operators.rollup import cascade
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences

KEYS = ["tier", "source", "doc_id", "bucket_ts"]
VALS = ["n", "sum_value", "mean_value", "min_value", "max_value", "sumsq_value"]


@pytest.fixture(scope="module")
def seq(spark):
    return generate_sequences(spark, 80, partitions=5).cache()


def _canon(df):
    pdf = df.select(*KEYS, *VALS).toPandas()
    return pdf.sort_values(KEYS, kind="mergesort").reset_index(drop=True)


def _assert_equal(a, b, atol):
    assert a.shape == b.shape
    for k in KEYS:
        assert (a[k].astype(str) == b[k].astype(str)).all(), k
    assert (a["n"] == b["n"]).all()
    for v in VALS[1:]:
        # aggregation order differs (numpy reduceat vs Spark partials):
        # equality is up to fp associativity, not bit-exact
        np.testing.assert_allclose(a[v], b[v], rtol=0, atol=atol, err_msg=v)


def test_fused_equals_cascade(spark, seq):
    fused = _canon(gapfill_tiers(seq, knockout=0.1))
    tiers = cascade(gapfill(seq, knockout=0.1).drop("is_obs"))
    ref = _canon(
        tiers["hourly"].unionByName(tiers["daily"]).unionByName(tiers["weekly"])
    )
    _assert_equal(fused, ref, atol=1e-9)


def test_fused_partition_invariance(spark, seq):
    a = _canon(gapfill_tiers(seq.repartition(1), knockout=0.1))
    b = _canon(gapfill_tiers(seq.repartition(7), knockout=0.1))
    # identical batch math per doc -> bit-exact across partitionings
    _assert_equal(a, b, atol=0)


def test_fused_plan_is_shuffle_free(spark, seq):
    plan = gapfill_tiers(seq)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
