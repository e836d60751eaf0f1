"""Semantic + plan + partition-invariance tests for the late-round-5
statistical batch: DSIR importance weights, stratified sampling, Holt
linear smoothing, seasonal hour-of-day anomaly, pairwise/lead-lag
correlation, hopping windows. Oracle equality is covered by
tools/check_contract.py and the driver gate; these pin the invariants
each docstring promises on constructed inputs.
"""

import math
import os

import pytest
from pyspark.sql import Row

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_docs as cdocs  # noqa: F401
import sentinel2_crop_trait_timeseries_spark.catalog_ts as cts  # noqa: F401

SF = "/root/testdata/sf0.001"

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _mkevents(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    return d


def _ev(event_id, ts, user_id=1, event_type="view", value=1.0):
    import datetime

    return Row(
        event_id=event_id,
        ts=datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=ts),
        user_id=user_id,
        event_type=event_type,
        value=value,
        props="{}",
    )


# ---------------------------------------------------------------------
# Holt linear fold
# ---------------------------------------------------------------------


def _holt_ref(cents):
    """Driver-side reference of the grid-snapped Holt recurrence."""
    l, b = float(cents[0]), 0.0
    for v in cents[1:]:
        l1 = math.floor((0.25 * v + 0.75 * (l + b)) * 1024 + 0.5) / 1024
        b = math.floor((0.25 * (l1 - l) + 0.75 * b) * 1024 + 0.5) / 1024
        l = l1
    return int(l * 1024), int(b * 1024)


def test_holt_matches_scalar_recurrence(spark, tmp_path):
    vals = [10.0, 12.5, 15.0, 14.0, 20.0, 19.0, 25.0]
    sf = _mkevents(
        spark, tmp_path, [_ev(i, 60 * i, value=v) for i, v in enumerate(vals)]
    )
    row = QUERIES["holt_linear_user"]["fn"](spark, sf).collect()[0]
    exp_l, exp_b = _holt_ref([round(v * 100) for v in vals])
    assert row["n_events"] == len(vals)
    assert row["level_x1024_cents"] == exp_l
    assert row["trend_x1024_cents"] == exp_b


def test_holt_trend_sign_tracks_series(spark, tmp_path):
    up = [_ev(i, 60 * i, user_id=1, value=float(i)) for i in range(20)]
    down = [
        _ev(100 + i, 60 * i, user_id=2, value=float(40 - i)) for i in range(20)
    ]
    sf = _mkevents(spark, tmp_path, up + down)
    got = {
        r["user_id"]: r for r in QUERIES["holt_linear_user"]["fn"](spark, sf).collect()
    }
    assert got[1]["trend_x1024_cents"] > 0
    assert got[2]["trend_x1024_cents"] < 0


# ---------------------------------------------------------------------
# Seasonal hour-of-day anomaly
# ---------------------------------------------------------------------


def test_seasonal_anomaly_flags_spike_only(spark, tmp_path):
    # 20 flat events in hour 0 + one 100x spike; hour 1 all-constant
    rows = [_ev(i, 60 * i, value=10.0) for i in range(20)]
    rows.append(_ev(99, 1500, value=1000.0))  # still hour 0
    rows += [_ev(200 + i, 3600 + 60 * i, value=5.0) for i in range(10)]
    sf = _mkevents(spark, tmp_path, rows)
    got = {r["event_id"]: r for r in
           QUERIES["seasonal_hod_anomaly"]["fn"](spark, sf).collect()}
    assert got[99]["is_anomaly"] == 1
    # constant hour: variance 0, strict > never fires
    assert all(got[200 + i]["is_anomaly"] == 0 for i in range(10))
    # flat events next to the spike: deviation below 2 std of the spiky cell
    assert sum(got[i]["is_anomaly"] for i in range(20)) == 0


# ---------------------------------------------------------------------
# Correlation pair + lead-lag scan
# ---------------------------------------------------------------------


def test_corr_perfectly_correlated_and_anti(spark, tmp_path):
    rows = []
    eid = 0
    for day in range(10):
        t = 86400 * day
        for _ in range(day + 1):  # 'click' count grows with day
            rows.append(_ev(eid, t + eid % 3600, event_type="click", value=1.0))
            eid += 1
        rows.append(  # 'view' daily sum = 2x click sum -> r = 1
            _ev(eid, t + 100, event_type="view", value=2.0 * (day + 1))
        )
        eid += 1
        rows.append(  # 'error' daily sum decreasing -> r = -1 vs click
            _ev(eid, t + 200, event_type="error", value=float(100 - day))
        )
        eid += 1
    sf = _mkevents(spark, tmp_path, rows)
    got = {(r["type_a"], r["type_b"]): r["pearson_r"]
           for r in QUERIES["corr_types_daily"]["fn"](spark, sf).collect()}
    assert got[("click", "view")] == pytest.approx(1.0, abs=1e-4)
    assert got[("click", "error")] == pytest.approx(-1.0, abs=1e-4)
    assert got[("error", "view")] == pytest.approx(-1.0, abs=1e-4)


def test_xcorr_recovers_injected_lag(spark, tmp_path):
    # purchase daily sum = click daily sum shifted by exactly 2 days
    rows, eid = [], 0
    series = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0, 5.0, 8.0]
    for day, v in enumerate(series):
        rows.append(_ev(eid, 86400 * day + 50, event_type="click", value=v))
        eid += 1
        rows.append(
            _ev(eid, 86400 * (day + 2) + 80, event_type="purchase", value=v)
        )
        eid += 1
    sf = _mkevents(spark, tmp_path, rows)
    got = {r["lag_days"]: r for r in
           QUERIES["xcorr_lag_scan"]["fn"](spark, sf).collect()}
    assert got[2]["xcorr"] == pytest.approx(1.0, abs=1e-4)
    assert got[2]["lag_rank"] == 1


# ---------------------------------------------------------------------
# Hopping windows
# ---------------------------------------------------------------------


def test_hopping_event_lands_in_exactly_width_windows(spark, tmp_path):
    sf = _mkevents(spark, tmp_path, [_ev(1, 7 * 3600 + 123, value=3.5)])
    got = QUERIES["hopping_window_counts"]["fn"](spark, sf).collect()
    assert len(got) == cts._HOP_SLOTS
    starts = sorted(r["window_start_us"] for r in got)
    import datetime

    base_us = int(
        datetime.datetime(
            2024, 1, 1, tzinfo=datetime.timezone.utc
        ).timestamp()
    ) * 1_000_000
    ev_hour = (base_us + (7 * 3600 + 123) * 1_000_000) // cts._HOUR_US
    assert starts == [
        (ev_hour - cts._HOP_SLOTS + 1 + i) * cts._HOUR_US
        for i in range(cts._HOP_SLOTS)
    ]
    assert all(r["n_events"] == 1 and r["sum_cents"] == 350 for r in got)


def test_hopping_window_sums_are_consistent(spark):
    got = QUERIES["hopping_window_counts"]["fn"](spark, SF).toPandas()
    ev = spark.read.parquet(f"{SF}/events.parquet").toPandas()
    # every (type, window) total across hops sums to width x direct total
    assert got.n_events.sum() == cts._HOP_SLOTS * len(ev)


# ---------------------------------------------------------------------
# DSIR + stratified sample
# ---------------------------------------------------------------------


def _doc(doc_id, text, lang, source="web"):
    return Row(doc_id=doc_id, text=text, lang=lang, source=source,
               n_chars=len(text))


def test_dsir_separates_target_from_offtarget(spark, tmp_path):
    d = str(tmp_path)
    rows = (
        [_doc(i, "alpha " * 20, "en") for i in range(5)]
        + [_doc(10 + i, "beta " * 20, "de") for i in range(5)]
        + [_doc(20, "alpha " * 10, "de"), _doc(21, "beta " * 10, "en")]
    )
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r["dsir_bits_per_token"] for r in
           QUERIES["dsir_importance_weights"]["fn"](spark, d).collect()}
    # docs made of target-distribution words outscore off-target docs,
    # regardless of their own lang label
    assert got[0] > got[10]
    assert got[20] > got[21] or got[20] > got[10]
    assert got[0] == got[20]  # same word -> same per-token ratio


def test_stratified_sample_exact_k_per_stratum(spark):
    got = QUERIES["stratified_sample_source"]["fn"](spark, SF).toPandas()
    per = got.groupby("source").size()
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    for src, k in per.items():
        n_src = int(got[got.source == src].n_source.iloc[0])
        assert k == min(cdocs._STRAT_K, n_src)
    assert got.sample_rank.max() <= cdocs._STRAT_K
    assert got.n_source.sum() >= len(got)  # sanity: strata at least cover picks
    assert got.doc_id.is_unique
    assert n_docs >= len(got)


# ---------------------------------------------------------------------
# Plan properties (the 100 TB contracts)
# ---------------------------------------------------------------------


def _executed(spark, name):
    return (
        QUERIES[name]["fn"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_seasonal_anomaly_baseline_broadcast(spark):
    plan = _executed(spark, "seasonal_hod_anomaly")
    assert plan.count("BroadcastHashJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan  # baseline agg combines map-side


def test_hopping_single_exchange_partial_agg(spark):
    plan = _executed(spark, "hopping_window_counts")
    assert "Generate" in plan  # narrow explode
    assert plan.count("Exchange") == 1  # only the final groupBy shuffles
    assert "partial_" in plan


def test_fold_and_sample_single_shuffle_no_python(spark):
    for name in ("holt_linear_user", "stratified_sample_source"):
        plan = _executed(spark, name)
        assert plan.count("Exchange") == 1, name
        for marker in ("BatchEvalPython", "ArrowEvalPython", "FlatMapsInPandas"):
            assert marker not in plan, name


def test_corr_queries_no_cartesian(spark):
    for name in ("corr_types_daily", "xcorr_lag_scan", "dsir_importance_weights"):
        plan = _executed(spark, name)
        assert "CartesianProduct" not in plan, name


def test_dsir_vocab_joins_are_shuffle_joins(spark):
    # the vocab (word) joins must NOT be broadcast: at web scale the
    # vocab is billions of rows; only the 1-row scalar frame broadcasts
    plan = _executed(spark, "dsir_importance_weights")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


# ---------------------------------------------------------------------
# Partition invariance (exactness-by-construction claims)
# ---------------------------------------------------------------------


def test_partition_invariance_of_stats_batch(spark):
    names = (
        "dsir_importance_weights",
        "stratified_sample_source",
        "holt_linear_user",
        "seasonal_hod_anomaly",
        "corr_types_daily",
        "xcorr_lag_scan",
        "hopping_window_counts",
    )

    def snap(n_part):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        try:
            return {
                name: sorted(
                    map(tuple, QUERIES[name]["fn"](spark, SF).collect())
                )
                for name in names
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a, b = snap(3), snap(32)
    for name in names:
        assert a[name] == b[name], name
