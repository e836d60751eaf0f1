"""Degenerate-input probes: every operator must handle 0 docs, 1-obs
docs, and constant series without crashing or emitting NaN/inf."""

import numpy as np
import pandas as pd

from sentinel2_crop_trait_timeseries_spark.operators.compress import (
    compress_segments,
    decompress_segments,
)
from sentinel2_crop_trait_timeseries_spark.operators.enkf import enkf_assimilate
from sentinel2_crop_trait_timeseries_spark.operators.fit import fit_sigmoid
from sentinel2_crop_trait_timeseries_spark.operators.gapfill import (
    gapfill,
    gapfill_tiers,
)
from sentinel2_crop_trait_timeseries_spark.operators.rollup import cascade
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences


def test_zero_docs_all_operators(spark):
    empty = generate_sequences(spark, 0, partitions=2)
    assert gapfill(empty).count() == 0
    assert gapfill_tiers(empty).count() == 0
    assert fit_sigmoid(empty).count() == 0
    assert enkf_assimilate(empty).count() == 0
    for df in cascade(gapfill(empty)).values():
        assert df.count() == 0


def test_single_obs_and_constant_docs(spark):
    rows = [
        ("s", "one", [100, 5000], 2),                      # single obs
        ("s", "flat", [100, 2000, 50, 2000, 50, 2000], 6),  # constant values
        ("s", "dup_ts", [100, 1000, 0, 2000], 4),           # zero gap
    ]
    pdf = pd.DataFrame(
        {
            "source": [r[0] for r in rows],
            "doc_id": [r[1] for r in rows],
            "tokens": [np.array(r[2], dtype=np.int32) for r in rows],
            "n_tok": [r[3] for r in rows],
        }
    )
    seq = spark.createDataFrame(pdf)
    dense = gapfill(seq).toPandas()
    assert np.isfinite(dense["value"]).all()
    one = dense[dense.doc_id == "one"]
    assert len(one) == 1 and one["value"].iloc[0] == 5.0
    flat = dense[dense.doc_id == "flat"]
    assert (flat["value"] == 2.0).all()  # flat anchors stay flat

    tiers = gapfill_tiers(seq).toPandas()
    assert np.isfinite(tiers["mean_value"]).all()

    res = enkf_assimilate(seq).toPandas()
    assert np.isfinite(res["assim_mean"]).all()

    fits = fit_sigmoid(seq).toPandas().set_index("doc_id")
    assert fits.loc["one", "status"] == "failed"  # < MIN_OBS, ledgered

    seg = compress_segments(gapfill(seq).select("source", "doc_id", "ts", "value"))
    back = decompress_segments(seg)
    assert back.count() == len(dense)
