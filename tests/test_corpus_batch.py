"""Semantic + plan + partition-invariance tests for the late-round-5
corpus-health batch (catalog_corpus.py) and the irate / interarrival
additions to catalog_ts.py. Oracle equality is covered by
tools/check_contract.py and the CI tail check; these pin the invariants
each docstring promises on constructed inputs.
"""

import datetime
import os

from pyspark.sql import Row

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_corpus as ccorp  # noqa: F401
import sentinel2_crop_trait_timeseries_spark.catalog_ts as cts  # noqa: F401

SF = "/root/testdata/sf0.001"

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _mkdocs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def _doc(doc_id, text, source="s0"):
    return Row(
        doc_id=doc_id, text=text, lang="en", source=source, n_chars=len(text)
    )


def _mkevents(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))
    return d


def _ev(event_id, secs, user_id=1, event_type="view", value=1.0, us=0):
    return Row(
        event_id=event_id,
        ts=datetime.datetime(2024, 1, 1)
        + datetime.timedelta(seconds=secs, microseconds=us),
        user_id=user_id,
        event_type=event_type,
        value=value,
        props="{}",
    )


# ---------------------------------------------------------------------
# PSI snapshot drift
# ---------------------------------------------------------------------


def test_psi_zero_when_halves_identical(spark, tmp_path):
    # even/odd doc_ids carry the same length mix -> every bucket has
    # a_n == b_n -> every term is 0 -> psi exactly 0
    rows = []
    for i in range(8):
        rows.append(_doc(2 * i, "w " * (2 ** (i % 3 + 1))))
        rows.append(_doc(2 * i + 1, "w " * (2 ** (i % 3 + 1))))
    sf = _mkdocs(spark, tmp_path, rows)
    out = QUERIES["psi_token_drift"]["fn"](spark, sf).collect()
    assert len(out) == 1
    assert out[0]["psi_x2p20"] == 0
    assert out[0]["psi"] == 0.0
    assert out[0]["n_docs_a"] == 8 and out[0]["n_docs_b"] == 8


def test_psi_positive_under_drift_and_dyadic_consistency(spark, tmp_path):
    # snapshot A: short docs; snapshot B: long docs -> strong drift
    rows = [_doc(2 * i, "w w") for i in range(10)]
    rows += [_doc(2 * i + 1, "w " * 300) for i in range(10)]
    sf = _mkdocs(spark, tmp_path, rows)
    r = QUERIES["psi_token_drift"]["fn"](spark, sf).collect()[0]
    assert r["psi_x2p20"] > 0
    assert r["psi"] == r["psi_x2p20"] / (1 << 20)  # exact dyadic quotient
    assert r["psi"] > 0.2  # the classic "investigate" threshold


def test_psi_buckets_are_exact_log2(spark, tmp_path):
    # 4-word and 5-word docs share bucket 3 (len(bin(4))=3, len(bin(5))=3)
    # while an 8-word doc lands in bucket 4 -> K=2 buckets
    rows = [
        _doc(0, "a b c d"),
        _doc(2, "a b c d e"),
        _doc(1, "a b c d e f g h"),
    ]
    sf = _mkdocs(spark, tmp_path, rows)
    r = QUERIES["psi_token_drift"]["fn"](spark, sf).collect()[0]
    assert r["n_buckets"] == 2


# ---------------------------------------------------------------------
# Zipf slope
# ---------------------------------------------------------------------


def test_zipf_slope_near_minus_one_on_power_law(spark, tmp_path):
    # frequencies ~ 6000/r over 30 ranks -> slope ~ -1, r2 ~ 1
    words = []
    for r in range(1, 31):
        words += [f"w{r:03d}"] * (6000 // r)
    rows = [
        _doc(i, " ".join(words[i::10])) for i in range(10)
    ]  # spread across docs; counts per source are what matters
    sf = _mkdocs(spark, tmp_path, rows)
    out = QUERIES["zipf_slope_source"]["fn"](spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_ranks"] == 30
    assert abs(r["zipf_slope"] + 1.0) < 0.05
    assert r["r2"] > 0.99


def test_zipf_top_k_cap_and_min_rank_gate(spark, tmp_path):
    # source with 100 distinct words -> capped at 64 ranks;
    # source with 3 words -> dropped by the n >= 8 gate
    big = " ".join(f"w{i}" for i in range(100))
    rows = [_doc(0, big, source="big"), _doc(1, "a b c", source="tiny")]
    sf = _mkdocs(spark, tmp_path, rows)
    out = {r["source"]: r for r in QUERIES["zipf_slope_source"]["fn"](
        spark, sf
    ).collect()}
    assert set(out) == {"big"}
    assert out["big"]["n_ranks"] == 64


# ---------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------


def test_novelty_zero_for_recrawl_one_for_fresh(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog"
    rows = [
        _doc(0, base),  # reference half (even)
        _doc(1, base),  # probe: exact re-crawl -> novelty 0
        _doc(3, "entirely novel text never seen anywhere before now"),
    ]
    sf = _mkdocs(spark, tmp_path, rows)
    out = {r["doc_id"]: r for r in QUERIES["ngram_novelty_score"]["fn"](
        spark, sf
    ).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_novel"] == 0 and out[1]["novelty_frac"] == 0.0
    assert out[3]["n_novel"] == out[3]["n_shingles"]
    assert out[3]["novelty_frac"] == 1.0


def test_novelty_partial_overlap_exact_fraction(spark, tmp_path):
    rows = [
        _doc(0, "a b c d"),  # ref shingles: {a b c, b c d}
        _doc(1, "a b c x y z"),  # probe: {a b c, b c x, c x y, x y z}
    ]
    sf = _mkdocs(spark, tmp_path, rows)
    r = QUERIES["ngram_novelty_score"]["fn"](spark, sf).collect()[0]
    assert r["n_shingles"] == 4 and r["n_novel"] == 3
    assert r["novelty_frac"] == 0.75


# ---------------------------------------------------------------------
# Hapax / TTR
# ---------------------------------------------------------------------


def test_hapax_hand_computed(spark, tmp_path):
    sf = _mkdocs(
        spark, tmp_path, [_doc(0, "a a b c"), _doc(1, "c d", source="s0")]
    )
    r = QUERIES["hapax_lexical_diversity"]["fn"](spark, sf).collect()[0]
    # tokens: a a b c c d -> 6; types: a b c d -> 4; hapax: b d -> 2
    assert r["n_tokens"] == 6 and r["n_types"] == 4 and r["n_hapax"] == 2
    assert abs(r["ttr"] - 4 / 6) < 1e-6
    assert abs(r["hapax_share"] - 0.5) < 1e-6


# ---------------------------------------------------------------------
# irate
# ---------------------------------------------------------------------


def test_irate_uses_last_two_only(spark, tmp_path):
    sf = _mkevents(
        spark,
        tmp_path,
        [
            _ev(1, 0, value=1.0),
            _ev(2, 60, value=5.0),
            _ev(3, 120, value=8.0),  # last two: (60s,500c) -> (120s,800c)
        ],
    )
    r = QUERIES["irate_last_two"]["fn"](spark, sf).collect()[0]
    assert r["d_us"] == 60_000_000 and r["d_cents"] == 300
    # 300 cents / 60 s = 3 dollars/min = 180/hr
    assert abs(r["irate_per_hr"] - 180.0) < 1e-6


def test_irate_counter_reset_takes_new_value(spark, tmp_path):
    sf = _mkevents(
        spark, tmp_path, [_ev(1, 0, value=9.0), _ev(2, 30, value=2.0)]
    )
    r = QUERIES["irate_last_two"]["fn"](spark, sf).collect()[0]
    assert r["d_cents"] == 200  # reset: increase = newer sample itself


def test_irate_drops_singletons_and_tied_timestamps(spark, tmp_path):
    sf = _mkevents(
        spark,
        tmp_path,
        [
            _ev(1, 0, user_id=1),  # singleton -> dropped
            _ev(2, 10, user_id=2, value=1.0),
            _ev(3, 10, user_id=2, value=2.0),  # tie at the tail -> dropped
            _ev(4, 0, user_id=3, value=1.0),
            _ev(5, 9, user_id=3, value=4.0),
        ],
    )
    out = QUERIES["irate_last_two"]["fn"](spark, sf).collect()
    assert [r["user_id"] for r in out] == [3]


# ---------------------------------------------------------------------
# interarrival histogram
# ---------------------------------------------------------------------


def test_interarrival_buckets_exact(spark, tmp_path):
    # same user, gaps of 0, 1, 2, 4 microseconds
    sf = _mkevents(
        spark,
        tmp_path,
        [
            _ev(1, 0, us=0),
            _ev(2, 0, us=0),  # gap 0 -> bucket 0
            _ev(3, 0, us=1),  # gap 1 -> bucket 1
            _ev(4, 0, us=3),  # gap 2 -> bucket 2
            _ev(5, 0, us=7),  # gap 4 -> bucket 3 (exact power of two)
        ],
    )
    out = {
        r["log2_bucket"]: r
        for r in QUERIES["interarrival_log2_histogram"]["fn"](
            spark, sf
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    assert out[3]["min_gap_us"] == 4 and out[3]["max_gap_us"] == 4
    assert all(r["n_gaps"] == 1 for r in out.values())


def test_interarrival_gaps_are_per_user(spark, tmp_path):
    # interleaved users must not cross-contaminate gaps
    sf = _mkevents(
        spark,
        tmp_path,
        [
            _ev(1, 0, user_id=1),
            _ev(2, 1, user_id=2),
            _ev(3, 100, user_id=1),  # user-1 gap = 100 s, not 99 s
        ],
    )
    out = QUERIES["interarrival_log2_histogram"]["fn"](spark, sf).collect()
    assert len(out) == 1
    assert out[0]["min_gap_us"] == 100_000_000


# ---------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------


def _plan(spark, name):
    return QUERIES[name]["fn"](spark, SF)._jdf.queryExecution().executedPlan(
    ).toString()


def test_psi_plan_no_explode_no_python(spark):
    p = _plan(spark, "psi_token_drift")
    assert "Generate" not in p  # size(filter(split)) is a narrow map
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p  # per-source totals broadcast back


def test_corpus_plans_no_cartesian_no_python(spark):
    for name in (
        "zipf_slope_source",
        "ngram_novelty_score",
        "hapax_lexical_diversity",
        "irate_last_two",
        "interarrival_log2_histogram",
    ):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, name
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_novelty_vocab_join_degrades_to_shuffle_join(spark):
    # the reference half is corpus-sized in production. No broadcast
    # HINT is placed, so AQE may broadcast it at fixture scale (fine);
    # with broadcast disabled (the stand-in for "reference half too big
    # to broadcast") the plan must fall back to a shuffle equi-join,
    # never a nested loop.
    for k in (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    ):
        spark.conf.set(k, "-1")
    try:
        p = _plan(spark, "ngram_novelty_score")
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "BroadcastNestedLoop" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


# ---------------------------------------------------------------------
# partition invariance (the house gate for every new exact-integer op)
# ---------------------------------------------------------------------


def test_partition_invariance_of_corpus_batch(spark):
    names = (
        "psi_token_drift",
        "zipf_slope_source",
        "ngram_novelty_score",
        "hapax_lexical_diversity",
        "irate_last_two",
        "interarrival_log2_histogram",
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


# ---------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------


def test_pmi_finds_the_collocation(spark, tmp_path):
    # "new york" always adjacent; filler words never repeat a pair
    text = " ".join(f"f{i} new york g{i}" for i in range(6))
    sf = _mkdocs(spark, tmp_path, [_doc(0, text)])
    out = QUERIES["pmi_collocations_topk"]["fn"](spark, sf).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert (top["w1"], top["w2"]) == ("new", "york")
    assert top["c12"] == 6
    assert top["pmi"] > 0


def test_pmi_drops_rare_pairs_and_caps_topk(spark, tmp_path):
    # every bigram occurs exactly twice except "a b" (4x) -> only
    # pairs with c12 >= 3 survive the noise floor
    text = "a b c d " * 2 + "a b " * 2
    sf = _mkdocs(spark, tmp_path, [_doc(0, text.strip())])
    out = QUERIES["pmi_collocations_topk"]["fn"](spark, sf).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}
    assert out[0]["c12"] == 4
    assert all(r["rank"] <= 5 for r in out)


# ---------------------------------------------------------------------
# rolling 7-day distinct users
# ---------------------------------------------------------------------


def test_rolling_7d_window_membership(spark, tmp_path):
    day = 86_400
    sf = _mkevents(
        spark,
        tmp_path,
        [
            _ev(1, 0 * day, user_id=1),
            _ev(2, 3 * day, user_id=2),
            _ev(3, 7 * day, user_id=3),  # day 0 falls OUT of day-7 window
        ],
    )
    out = {
        r["day_us"] // (day * 1_000_000): r
        for r in QUERIES["rolling_7d_distinct_users"]["fn"](
            spark, sf
        ).collect()
    }
    base = out[19723]  # 2024-01-01 is day 19723 since epoch
    assert base["n_users_7d"] == 1 and base["n_users_1d"] == 1
    d3 = out[19726]
    assert d3["n_users_7d"] == 2 and d3["n_users_1d"] == 1
    d7 = out[19730]
    assert d7["n_users_7d"] == 2  # users 2 (day 3) and 3; NOT user 1
    # only active days are surfaced: days 1,2,4,5,6 absent
    assert set(out) == {19723, 19726, 19730}


def test_rolling_7d_same_user_counts_once(spark, tmp_path):
    day = 86_400
    sf = _mkevents(
        spark,
        tmp_path,
        [_ev(i, i * day, user_id=7) for i in range(3)],
    )
    out = QUERIES["rolling_7d_distinct_users"]["fn"](spark, sf).collect()
    assert all(r["n_users_7d"] == 1 for r in out)


def test_batch2_plans_no_cartesian_no_python(spark):
    for name in ("pmi_collocations_topk", "rolling_7d_distinct_users"):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p, name
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, name


def test_partition_invariance_of_batch2(spark):
    names = ("pmi_collocations_topk", "rolling_7d_distinct_users")

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
