"""Batched LM sigmoid fit: parameter recovery, failure ledger,
partition invariance."""

import numpy as np
import pandas as pd
import pytest

from sentinel2_crop_trait_timeseries_spark.operators.fit import (
    fit_batch,
    fit_sigmoid,
    lm_fit_sigmoid_batched,
)
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences


def test_lm_recovers_known_params_exactly():
    rng = np.random.default_rng(7)
    n, m = 40, 15
    true = np.stack(
        [
            rng.uniform(3, 8, n),      # L
            rng.uniform(5, 15, n),     # k
            rng.uniform(0.3, 0.7, n),  # x0
            rng.uniform(0, 1, n),      # b
        ],
        axis=1,
    )
    x = np.sort(rng.uniform(0, 1, (n, m)), axis=1)
    L, k, x0, b = true.T
    y = L[:, None] / (1 + np.exp(-k[:, None] * (x - x0[:, None]))) + b[:, None]
    mask = np.ones((n, m), dtype=bool)
    p, rmse, n_iter, ok, seed_ok = lm_fit_sigmoid_batched(x, y, mask)
    assert ok.all()
    assert seed_ok.all()  # clean sigmoids: every doc starts at the logit fit
    assert (rmse < 1e-4).all()
    np.testing.assert_allclose(p, true, rtol=1e-2, atol=2e-2)


def test_noisy_fit_and_failure_ledger():
    # two good docs + one too-short doc + one constant doc
    def tokens(vals, gaps):
        out = []
        for g, v in zip(gaps, vals):
            out += [int(g), int(round(v * 1000))]
        return out

    rng = np.random.default_rng(3)
    frac = np.linspace(0, 1, 14)
    good = 0.3 + 6.0 / (1 + np.exp(-9 * (frac - 0.5)))
    rows = [
        ("s", "good1", tokens(good + rng.normal(0, 0.05, 14), [100] * 14)),
        ("s", "good2", tokens(good * 0.8 + rng.normal(0, 0.05, 14), [80] * 14)),
        ("s", "short", tokens([1.0, 2.0], [50, 50])),
        ("s", "flat", tokens([2.0] * 14, [60] * 14)),
    ]
    pdf = pd.DataFrame(
        {
            "source": [r[0] for r in rows],
            "doc_id": [r[1] for r in rows],
            "tokens": [np.array(r[2], dtype=np.int32) for r in rows],
            "n_tok": [len(r[2]) for r in rows],
        }
    )
    res = fit_batch(pdf).set_index("doc_id")
    assert res.loc["good1", "status"] == "done"
    assert res.loc["good1", "fit_rmse"] < 0.1
    assert abs(res.loc["good1", "L"] - 6.0) < 0.5
    assert res.loc["good1", "seed_used"] == 1  # logit seed accepted
    assert res.loc["short", "status"] == "failed"  # < MIN_OBS
    assert res.loc["flat", "status"] == "done"  # degenerate but finite
    assert res.loc["flat", "fit_rmse"] < 1e-6
    assert res.loc["flat", "seed_used"] == 0  # heuristic start: no
    # structural LM<=logit bound applies (fit_sigmoid_events escape)


def test_spark_fit_partition_invariant(spark):
    seq = generate_sequences(spark, 120, partitions=3).cache()
    a = fit_sigmoid(seq.repartition(1)).orderBy("doc_id").collect()
    b = fit_sigmoid(seq.repartition(6)).orderBy("doc_id").collect()
    assert a == b
    done = [r for r in a if r["status"] == "done"]
    assert len(done) >= 0.9 * len(a)  # generator series are sigmoid-shaped
    med_rmse = float(np.median([r["fit_rmse"] for r in done]))
    assert med_rmse < 0.3
