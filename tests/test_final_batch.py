"""Property tests for the serving/information batch (catalog_final.py).

Oracle equality is covered by tools/check_contract.py and the CI tail
check; these pin each operator's semantic invariants (against pandas
recomputation where cheap) plus partition-invariance for the
exactness-by-construction claims.
"""

import math

import numpy as np
import pandas as pd
import pytest

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_final  # noqa: F401

SF = "/root/testdata/sf0.001"

_NEW = [
    "m4_downsample",
    "vwap_type_daily",
    "bollinger_bands",
    "token_entropy_source",
    "markov_transitions",
    "kl_divergence_source",
    "sma_crossover_signals",
    "time_travel_snapshot",
]


def _run(spark, name):
    return QUERIES[name]["fn"](spark, SF).toPandas()


@pytest.fixture(scope="module")
def events(spark):
    return (
        spark.read.parquet(f"{SF}/events.parquet")
        .toPandas()
        .assign(
            ts_us=lambda d: d.ts.astype("datetime64[us]").astype("int64"),
            cents=lambda d: (d.value * 100).round().astype("int64"),
        )
    )


def test_m4_matches_pandas(spark, events):
    got = _run(spark, "m4_downsample").sort_values(
        ["user_id", "day_ts"]
    ).reset_index(drop=True)
    e = events.assign(day_ts=(events.ts_us // 86_400_000_000) * 86400)
    e = e.sort_values(["user_id", "day_ts", "ts_us", "event_id"])
    exp = (
        e.groupby(["user_id", "day_ts"], as_index=False)
        .agg(
            n_points=("cents", "size"),
            min_cents=("cents", "min"),
            max_cents=("cents", "max"),
            first_ts_us=("ts_us", "min"),
            last_ts_us=("ts_us", "max"),
            first_cents=("cents", "first"),
            last_cents=("cents", "last"),
        )
        .sort_values(["user_id", "day_ts"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[exp.columns].astype("int64"), exp.astype("int64")
    )
    # M4 envelope invariants
    assert (got.min_cents <= got.max_cents).all()
    assert got.first_cents.between(got.min_cents, got.max_cents).all()
    assert got.last_cents.between(got.min_cents, got.max_cents).all()


def test_vwap_weighted_mean_bounds(spark, events):
    got = _run(spark, "vwap_type_daily")
    e = events.assign(
        day_ts=(events.ts_us // 86_400_000_000) * 86400,
        qty=events.event_id % 7 + 1,
    )
    e["notional"] = e.cents * e.qty
    exp = e.groupby(["event_type", "day_ts"], as_index=False).agg(
        n_trades=("cents", "size"),
        volume=("qty", "sum"),
        notional_cents=("notional", "sum"),
    )
    m = got.merge(exp, on=["event_type", "day_ts"], suffixes=("", "_exp"))
    assert len(m) == len(got) == len(exp)
    assert (m.volume == m.volume_exp).all()
    assert (m.notional_cents == m.notional_cents_exp).all()
    # vwap is a qty-weighted mean -> inside the group's [min, max] cents
    lohi = e.groupby(["event_type", "day_ts"], as_index=False).agg(
        lo=("cents", "min"), hi=("cents", "max")
    )
    m2 = got.merge(lohi, on=["event_type", "day_ts"])
    assert (m2.vwap_cents >= m2.lo - 1e-3).all()
    assert (m2.vwap_cents <= m2.hi + 1e-3).all()


def test_bollinger_matches_pandas_rolling(spark, events):
    got = _run(spark, "bollinger_bands").sort_values("event_id")
    s = events.sort_values(["user_id", "ts_us", "event_id"])
    g = s.groupby("user_id").cents
    ma = g.rolling(20, min_periods=1).mean().reset_index(level=0, drop=True)
    sd = (
        g.rolling(20, min_periods=1)
        .std(ddof=0)
        .reset_index(level=0, drop=True)
        .fillna(0.0)
    )
    s = s.assign(ma=ma, sd=sd).sort_values("event_id")
    assert np.allclose(got.ma_cents.to_numpy(), s.ma.to_numpy(), atol=5e-4)
    assert np.allclose(
        got.bb_upper.to_numpy(), (s.ma + 2 * s.sd).to_numpy(), atol=1e-3
    )
    assert np.allclose(
        got.bb_lower.to_numpy(), (s.ma - 2 * s.sd).to_numpy(), atol=1e-3
    )
    assert (got.bb_upper >= got.ma_cents).all()
    assert (got.bb_lower <= got.ma_cents).all()


def test_entropy_information_bounds(spark):
    got = _run(spark, "token_entropy_source")
    # 0 <= H <= ln(n_vocab) (uniform maximizes), within the 4-dp snap
    assert (got.entropy_nats >= -5e-4).all()
    assert (
        got.entropy_nats <= np.log(got.n_vocab.to_numpy()) + 5e-4
    ).all()
    assert (got.n_vocab <= got.n_words).all()


def test_entropy_matches_numpy_on_one_source(spark, events):
    got = _run(spark, "token_entropy_source")
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    src = got.source.iloc[0]
    words = [
        w
        for t in docs[docs.source == src].text
        for w in t.split()
        if w
    ]
    c = pd.Series(words).value_counts().to_numpy().astype(float)
    n = c.sum()
    h = math.log(n) - float((c * np.log(c)).sum()) / n
    row = got[got.source == src].iloc[0]
    assert row.n_words == int(n) and row.n_vocab == len(c)
    assert abs(row.entropy_nats - h) < 1e-3


def test_markov_rows_sum_to_one(spark, events):
    got = _run(spark, "markov_transitions")
    s = events.sort_values(["user_id", "ts_us", "event_id"])
    s["prev"] = s.groupby("user_id").event_type.shift(1)
    pairs = s.dropna(subset=["prev"])
    assert got.n_pair.sum() == len(pairs)
    # row-conditional distribution sums to 1 per prev_type
    per_prev = got.groupby("prev_type").agg(
        n_from=("n_from", "first"), tot=("n_pair", "sum")
    )
    assert (per_prev.n_from == per_prev.tot).all()
    psum = got.groupby("prev_type").p_next.sum()
    assert np.allclose(psum.to_numpy(), 1.0, atol=2e-3)
    exp = pairs.groupby(["prev", "event_type"]).size()
    for (p, nx), n in exp.items():
        assert int(
            got[(got.prev_type == p) & (got.next_type == nx)].n_pair.iloc[0]
        ) == n


def test_kl_nonnegative_and_matches_numpy(spark):
    got = _run(spark, "kl_divergence_source").set_index("source")
    # Gibbs: true KL >= 0; snapped sum can undershoot by <= vocab/2 ulps
    assert (got.kl_x2p20 >= -got.n_words).all()
    docs = spark.read.parquet(f"{SF}/documents.parquet").toPandas()
    words = docs.assign(w=docs.text.str.split()).explode("w")
    words = words[words.w.astype(str).str.len() > 0]
    cw = words.groupby("w").size()
    n = float(cw.sum())
    for src in list(got.index)[:3]:
        csw = words[words.source == src].groupby("w").size()
        ns = float(csw.sum())
        p_s = csw / ns
        p = cw.loc[csw.index] / n
        kl = float((p_s * np.log(p_s / p)).sum())
        row = got.loc[src]
        assert row.n_words == int(ns)
        assert abs(row.kl_nats - kl) < 1e-3
        assert kl >= 0


def test_sma_crossover_matches_pandas(spark, events):
    got = _run(spark, "sma_crossover_signals").sort_values("event_id")
    s = events.sort_values(["user_id", "ts_us", "event_id"]).copy()
    g = s.groupby("user_id").cents
    s["s5"] = g.rolling(5).sum().reset_index(level=0, drop=True)
    s["s20"] = g.rolling(20).sum().reset_index(level=0, drop=True)
    s["diff"] = 4 * s.s5 - s.s20
    s["pdiff"] = s.groupby("user_id")["diff"].shift(1)
    s["rn"] = s.groupby("user_id").cumcount() + 1
    exp = s[
        (s.rn >= 21)
        & (
            ((s.pdiff < 0) & (s["diff"] >= 0))
            | ((s.pdiff > 0) & (s["diff"] <= 0))
        )
    ]
    assert sorted(got.event_id) == sorted(exp.event_id)
    m = got.set_index("event_id").join(
        exp.set_index("event_id")[["pdiff"]], rsuffix="_exp"
    )
    assert (
        (m.direction == "golden") == (m.pdiff_exp < 0)
    ).all()
    # NOTE: strict golden/death alternation is NOT an invariant — a
    # diff == 0 touch emits a signal while leaving the next lag at 0
    # (no signal), so two same-direction crossings can follow; the
    # pandas recomputation above pins the exact semantics instead.


def test_time_travel_matches_pandas(spark, events):
    from sentinel2_crop_trait_timeseries_spark.catalog_final import _ASOF_US

    got = _run(spark, "time_travel_snapshot").set_index("user_id")
    v = events[events.ts_us <= _ASOF_US].sort_values(
        ["user_id", "ts_us", "event_id"]
    )
    last = v.groupby("user_id").tail(1)
    live = last[last.event_type != "error"]
    assert sorted(got.index) == sorted(live.user_id)
    m = got.join(live.set_index("user_id"), rsuffix="_exp")
    assert (m.version_event_id == m.event_id).all()
    assert (m.cents_asof == m.cents).all()
    nv = v.groupby("user_id").size()
    assert (got.n_versions == nv.loc[got.index]).all()
    # versions after T never leak into the snapshot
    assert (got.version_ts_us <= _ASOF_US).all()


@pytest.mark.parametrize("name", _NEW)
def test_partition_invariance(spark, name):
    """The exactness-by-construction claim: identical results at any
    shuffle width / input partitioning."""
    a = _run(spark, name)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = QUERIES[name]["fn"](spark, SF).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    cols = sorted(a.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
