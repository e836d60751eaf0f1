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
# so _HEAD/_TAIL ROTATE each round: every _TAIL entry of round N moves
# into _HEAD for round N+1 (and a same-sized set of just-driver-verified
# stable queries rotates out), so the union of two consecutive driver
# artifacts covers every registered query. _TAIL queries stay registered
# and locally oracle-checked via tools/check_contract.py.
#
# Round-4 _HEAD = the 13 queries parked in r3's _TAIL (never yet
# driver-verified) + everything changed or added this round (fixed-point
# k-means pair, seed-escape fit pair, capped dedup pair, streaming
# daily/weekly cascades, PQ/IVF+PQ, components, streaming dedup probe,
# retention views, sequence packing, vocab coverage, curation batches
# 2+3: decontamination / unigram-LM / mixture weights / BPE train+encode
# / repetition ratio / shard shuffle / span dedup, plus
# dedup_ngram_jaccard whose plan changed with the _shingles rewrite)
# + engine-path proofs and LLM-pipeline operators. Rotated out to
# _TAIL: 33 relational/docs/engine queries that are driver-green in
# CORRECTNESS_r03.json (or locally oracle-verified) and unchanged
# since; every _TAIL entry is oracle-checked at sf0.001 by
# tests/test_tail_contract.py each CI run.
_WINDOW = 50
_HEAD = [
    # never driver-verified before (r3 _TAIL) — must land in-window
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
    # new/changed in round 4
    "streaming_rollup_daily",
    "ivf_train_kmeans",
    "ann_ivf_trained",
    "ann_recall",
    "fit_sigmoid_logit",
    "fit_sigmoid_events",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_pq",
    "ann_ivfpq",
    "dedup_components",
    "streaming_dedup_probe",
    "pack_chunks_manifest",
    "pack_chunk_tokens",
    "vocab_top_coverage",
    "streaming_rollup_weekly",
    "multimodal_resize_pixels",
    "retention_serving_union",
    "caggs_incremental_refresh",
    "decontaminate_overlap",
    "quality_lm_perplexity",
    "source_mixture_weights",
    "bpe_train_merges",
    "doc_repetition_ratio",
    "shard_shuffle_assign",
    "bpe_encode_tokens",
    # plan changed this round (_shingles lost its DataFrame.distinct)
    "dedup_ngram_jaccard",
    "dedup_span_exact",
    "quality_decile_thresholds",
    "tfidf_top_terms",
    "embedding_outlier_zscore",
    # engine-path proofs + flagship family
    "gorilla_roundtrip",
    "token_roundtrip",
    "streaming_rollup_hourly",
    "streaming_sessionize",
    "gapfill_dose_response",
    # LLM-pipeline operators
    "dedup_exact",
]
_TAIL = [
    # driver-green in CORRECTNESS_r03.json, unchanged since, displaced
    # by the curation batch-3 block above; rotate back next round
    "multimodal_meta",
    "multimodal_frame_sample",
    "rollup_hourly_salted",
    "kernel_smooth_events",
    "lut_inversion_topk",
    "gapfill_asymptotic_daily",
    "gapfill_wang_engels",
    "enkf_assimilate_events",
    # displaced by the curation batch-2 block; rotate back next round
    "dedup_embedding_cosine",
    "embedding_label_stats",
    "ann_topk_bruteforce",
    # all driver-green in CORRECTNESS_r03.json, unchanged since;
    # rotate back into _HEAD next round
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
    cut = min(len(head), 21)  # after the changed-this-round block
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
