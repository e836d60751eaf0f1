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

# Contract ordering. The driver's CORRECTNESS artifact records the first
# ~50 queries in dict order (the "window"). More than 50 are registered,
# so _HEAD/_TAIL ROTATE each round: _TAIL entries move into _HEAD on the
# following rounds, oldest-driver-verification first, so the union of
# consecutive driver artifacts covers every registered query. With 123
# registered and a 50-entry window the covering union is THREE rounds
# (two rounds cap at 100); rotation priority for round N+1's _HEAD is
# (1) queries never driver-verified (added after round N's window
# filled), (2) entries whose last driver row is oldest, (3) changed
# queries. Every out-of-window query is oracle-checked at sf0.001 on
# EVERY CI run by tests/test_tail_contract.py and at 3 SFs locally via
# tools/check_contract.py, so nothing ships unverified between its
# driver rounds.
#
# Round-6 _HEAD = exactly the 48 post-window r5 registrations (never
# driver-verified — r5 VERDICT task #1) + the 2 most-rewritten r6
# optimization targets (ann_topk_bruteforce, streaming_dedup_probe);
# no new queries were registered this round (registration freeze).
# Green rows here make r4 ∪ r5 ∪ r6 cover the full 146-query ledger.
# Every _TAIL entry is oracle-checked at sf0.001 by
# tests/test_tail_contract.py each CI run.
_WINDOW = 50
_HEAD = [
    # r6 _HEAD = EXACTLY the 48 queries registered after r5's window
    # filled (never driver-verified; r5 VERDICT task #1: one
    # disciplined window converts the whole ledger to
    # artifact-of-record-verified, r4 u r5 u r6 covering all 146) ...
    "time_weighted_avg_daily",
    "counter_rate_daily",
    "lttb_downsample",
    "ewma_user_fold",
    "rolling_median_user",
    "cusum_changepoint_user",
    "mixture_token_budget",
    "funnel_steps_user",
    "cohort_retention_weekly",
    "bucket_gapfill_locf",
    "pivot_type_daily",
    "scd2_segment_intervals",
    "streaming_asof_probe",
    "streaming_cusum_state",
    "unpivot_type_daily",
    "pareto_source_share",
    "interval_overlap_bursts",
    "dsir_importance_weights",
    "stratified_sample_source",
    "holt_linear_user",
    "seasonal_hod_anomaly",
    "corr_types_daily",
    "xcorr_lag_scan",
    "hopping_window_counts",
    "zorder_cell_stats",
    "heavy_hitters_cms",
    "bloom_semijoin_prune",
    "kmv_distinct_estimate",
    "state_durations_user",
    "streaming_interval_join",
    "cdc_merge_apply",
    "dq_expectations_orders",
    "psi_token_drift",
    "zipf_slope_source",
    "ngram_novelty_score",
    "hapax_lexical_diversity",
    "irate_last_two",
    "interarrival_log2_histogram",
    "pmi_collocations_topk",
    "rolling_7d_distinct_users",
    "m4_downsample",
    "vwap_type_daily",
    "bollinger_bands",
    "token_entropy_source",
    "markov_transitions",
    "kl_divergence_source",
    "sma_crossover_signals",
    "time_travel_snapshot",
    "ann_topk_bruteforce",
    "streaming_dedup_probe",
    # ... + the 2 most-rewritten r6 optimization targets (both
    # r4-green before; candidate scoring / sink granularity changed
    # this round, so their driver rows are stale): no new queries were
    # registered this round (r5 VERDICT registration freeze).
    # --- brand-new queries are inserted HERE by _ordered() ---
]
_TAIL = [
    # driver-green in CORRECTNESS_r01-r05 (r4 u r5 covers every entry);
    # each is oracle-checked at sf0.001 on EVERY CI run by
    # tests/test_tail_contract.py and 3-SF-swept locally via
    # tools/check_contract.py; rotates back into _HEAD by staleness
    "multimodal_meta",
    "multimodal_frame_sample",
    "rollup_hourly_salted",
    "kernel_smooth_events",
    "lut_inversion_topk",
    "gapfill_asymptotic_daily",
    "gapfill_wang_engels",
    "enkf_assimilate_events",
    "dedup_embedding_cosine",
    "embedding_label_stats",
    "ann_multiprobe",
    "ann_ivf",
    "text_token_counts",
    "text_quality_score",
    "lang_id_wordprofile",
    "doc_fingerprint",
    "spatial_snap_nn",
    "sessionize",
    "asof_join_signup",
    "rollup_hourly",
    "pricing_summary",
    "rollup_daily_cascade",
    "continuous_agg_daily",
    "rollup_grouping_sets",
    "error_stats_by_type",
    "tolerance_join",
    "daily_spine_zerofill",
    "lag_diff_monotone",
    "outlier_filter",
    "knockout_mask",
    "scalar_surface_outer",
    "sample_fraction_bounds",
    "approx_sketch_bounds",
    "string_map_surface",
    "json_props",
    "embedding_outlier_zscore",
    "quality_decile_thresholds",
    "ann_recall_clustered",
    "gorilla_quantized_roundtrip",
    "curation_pipeline_counts",
    "candlestick_daily",
    "regr_stats_user",
    "rollup_monthly_calendar",
    "heartbeat_liveness_user",
    "candlestick_weekly_rollup",
    "histogram_quantile_type",
    "column_profile_orders",
    "asof_join_clicks",
    "gaps_islands_user",
    "revenue_by_nation",
    "brand_part_stats",
    "customers_no_orders",
    "gapfill_linear",
    "ann_lsh_bucketed",
    "rollup_weekly_cascade",
    "cumsum_user",
    "topk_per_group",
    "user_first_last",
    "event_histogram",
    "big_spender_segments",
    "part_name_split",
    "orders_date_window",
    "streaming_rollup_daily",
    "ivf_train_kmeans",
    "ann_ivf_trained",
    "fit_sigmoid_logit",
    "fit_sigmoid_events",
    "dedup_simhash",
    "ann_pq",
    "pack_chunk_tokens",
    "vocab_top_coverage",
    "streaming_rollup_weekly",
    "multimodal_resize_pixels",
    "retention_serving_union",
    "caggs_incremental_refresh",
    "quality_lm_perplexity",
    "source_mixture_weights",
    "doc_repetition_ratio",
    "shard_shuffle_assign",
    "bpe_encode_tokens",
    "dedup_ngram_jaccard",
    "token_roundtrip",
    "streaming_rollup_hourly",
    "streaming_sessionize",
    "dedup_exact",
    "decontaminate_overlap",
    "tfidf_top_terms",
    "dedup_span_exact",
    "ann_ivfpq",
    "ann_recall",
    "gorilla_roundtrip",
    "bpe_train_merges",
    "pack_chunks_manifest",
    "gapfill_dose_response",
    "dedup_minhash_lsh",
    "dedup_components",
]

assert len(_HEAD) == _WINDOW, (
    f"_HEAD must fill the driver window exactly ({len(_HEAD)} != {_WINDOW}); "
    "rotate an entry to _TAIL instead of overflowing"
)


def _ordered() -> list[str]:
    """_HEAD, then unknown (brand-new) queries INSIDE the window right
    after the must-verify block, then _TAIL. Extras displace the last
    _HEAD entries past the window edge — visible rotation, never a
    silently-unverified new query (the r3 bug appended extras after all
    50 _HEAD entries, so new queries always fell outside the window)."""
    known = set(_HEAD) | set(_TAIL)
    extras = [n for n in QUERIES if n not in known]
    head = [n for n in _HEAD if n in QUERIES]
    cut = min(len(head), 41)  # after the must-verify (r4-tail + changed/new) block
    return head[:cut] + extras + head[cut:] + [
        n for n in _TAIL if n in QUERIES
    ]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["gapfill_dose_response"]["fn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERIES[name]["fn"] for name in _ordered()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return {
        name: QUERIES[name]["sql"]
        for name in _ordered()
        if QUERIES[name]["sql"]
    }
