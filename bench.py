#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Also times the engine pipeline itself (synthetic tokenized sequences ->
decode -> 3-tier rollup cascade) and reports rolled-up points/sec and
sequences/sec, the BASELINE.json headline metric.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from sentinel2_crop_trait_timeseries_spark.session import get_spark  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.decode import decode_observations_arrow  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.rollup import cascade  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.gapfill import gapfill_tiers  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.compress import compress_segments  # noqa: E402

# headline subset: engine-shaped queries + relational coverage; the rest
# of the catalog is exercised by the driver's correctness gate.
HEADLINE = [
    "rollup_hourly",
    "rollup_daily_cascade",
    "rollup_weekly_cascade",
    "continuous_agg_daily",
    "error_stats_by_type",
    "gapfill_dose_response",
    "asof_join_signup",
    "tolerance_join",
    "sessionize",
    "pricing_summary",
    "revenue_by_nation",
    "daily_spine_zerofill",
    # training-data pipeline + engine-operator paths
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "text_quality_score",
    "token_roundtrip",
    "gorilla_roundtrip",
    # round-2 additions: banded simhash, numeric-pipeline ops, spatial
    # NN, multi-probe ANN
    "dedup_simhash",
    "enkf_assimilate_events",
    "lut_inversion_topk",
    "spatial_snap_nn",
    "ann_multiprobe",
    # round-3 additions: kernel smoother (banded 1-D grid join),
    # k-means IVF codebook training (broadcast-join Lloyd rounds)
    "kernel_smooth_events",
    "ivf_train_kmeans",
    # round-4 additions: trained-IVF search (checkpointed Lloyd chain —
    # timing should show ONE k-means execution), streaming daily cascade,
    # dedup clustering (iterative components), PQ codes + ADC search
    "ann_ivf_trained",
    "streaming_rollup_daily",
    "dedup_components",
    "ann_pq",
    "ann_ivfpq",
    # late-r4: streaming incremental dedup (arrivals probe the static
    # corpus band index per microbatch)
    "streaming_dedup_probe",
    # late-r4: retention-policy serving view + invalidation refresh
    "retention_serving_union",
    "caggs_incremental_refresh",
    # late-r4 curation batches 2+3: decontamination probe, unigram-LM
    # scoring, BPE train + encode, sequence packing, repetition filter,
    # epoch shard shuffle
    "decontaminate_overlap",
    "quality_lm_perplexity",
    "bpe_train_merges",
    "bpe_encode_tokens",
    "pack_chunks_manifest",
    "doc_repetition_ratio",
    "shard_shuffle_assign",
    "dedup_span_exact",
    "quality_decile_thresholds",
    "tfidf_top_terms",
    "embedding_outlier_zscore",
    # round-5 additions: recall panel on the clustered derivation,
    # quantized Gorilla round-trip, and the COMPOSED curation pipeline
    # (quality -> dedup-canonical -> decontaminate -> pack -> shard)
    "ann_recall_clustered",
    "gorilla_quantized_roundtrip",
    "curation_pipeline_counts",
    # round-5 ordered-timeseries batch (catalog_ts.py): two-relation
    # ASOF join (union-tag single shuffle), gaps-and-islands, LOCF
    # time-weighted average, counter-reset rate, iterative LTTB
    # downsample, grid-snapped EWMA fold
    "asof_join_clicks",
    "gaps_islands_user",
    "time_weighted_avg_daily",
    "counter_rate_daily",
    "lttb_downsample",
    "ewma_user_fold",
    "rolling_median_user",
    "cusum_changepoint_user",
    "mixture_token_budget",
    # round-5 batch 3: funnel, cohort retention, bucket gap-fill
    # (locf+interpolate), pivot, SCD2 intervals, streaming ASOF
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
    # round-5 batch 4 (statistical): DSIR importance weights,
    # stratified per-source sample, Holt linear fold, hour-of-day
    # anomaly (128-bit integer test), correlation pair + lag scan,
    # hopping windows
    "dsir_importance_weights",
    "stratified_sample_source",
    "holt_linear_user",
    "seasonal_hod_anomaly",
    "corr_types_daily",
    "xcorr_lag_scan",
    "hopping_window_counts",
    # round-5 batch 5 (layout/sketch): z-order clustering cells,
    # count-min heavy hitters, Bloom semi-join pruning
    "zorder_cell_stats",
    "heavy_hitters_cms",
    "bloom_semijoin_prune",
    "kmv_distinct_estimate",
    "state_durations_user",
    "streaming_interval_join",
    "cdc_merge_apply",
    "dq_expectations_orders",
    "candlestick_daily",
    "candlestick_weekly_rollup",
    "regr_stats_user",
    "rollup_monthly_calendar",
    "heartbeat_liveness_user",
    "histogram_quantile_type",
    "column_profile_orders",
    # round-5 batch 6 (corpus health): PSI snapshot drift, Zipf slope,
    # n-gram novelty vs reference half, hapax/TTR diversity, Prometheus
    # irate, inter-arrival log2 histogram
    "psi_token_drift",
    "zipf_slope_source",
    "ngram_novelty_score",
    "hapax_lexical_diversity",
    "irate_last_two",
    "interarrival_log2_histogram",
    "pmi_collocations_topk",
    "rolling_7d_distinct_users",
    # late-r5 serving/information batch (catalog_final.py)
    "m4_downsample",
    "vwap_type_daily",
    "bollinger_bands",
    "token_entropy_source",
    "markov_transitions",
    "kl_divergence_source",
    "sma_crossover_signals",
    "time_travel_snapshot",
]

# engine-pipeline scale for the bench (docs); ~14 obs/doc average
ENGINE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))


def _probe_host() -> float:
    """32-way CPU burn probe (M iters/s): this VM has minutes-scale
    hypervisor throttle windows that swing job times 2-6x (healthy
    reads ~280, throttled windows as low as ~63 — see
    bench_results/bench_windows_r5*.json). Emitting the probe INSIDE
    the bench JSON lets any reader normalize a slow artifact against
    the host window it ran in instead of mistaking throttle for a plan
    regression."""
    import multiprocessing as mp

    try:
        from tools.bench_scaling_calibrated import probe_capacity

        pool = mp.Pool(32)
        try:
            probe_capacity(pool, settle=1.0)  # warm
            return round(probe_capacity(pool, settle=1.0), 1)
        finally:
            pool.close()
    except Exception:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    probe_before = _probe_host()
    spark = get_spark("s2tt_bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]["fn"]
        fn(spark, sf_dir).count()  # warm (JIT, parquet footer cache)
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 4)

    # engine pipeline: sequences -> decode -> 3-tier rollup cascade.
    # Tiers are MATERIALIZED finest-first (hourly written, daily read from
    # hourly, ...) — the retention-engine plan: the raw-row shuffle happens
    # exactly once, coarser tiers aggregate the already-reduced parquet.
    seq = generate_sequences(spark, ENGINE_DOCS, partitions=cpus * 2)
    seq.write.mode("overwrite").parquet("/tmp/bench_seq.parquet")
    seq_stored = spark.read.parquet("/tmp/bench_seq.parquet")
    t0 = time.perf_counter()
    obs = decode_observations_arrow(seq_stored)
    tiers = cascade(obs, materialize_dir="/tmp/bench_tiers", spark=spark)
    points = {t: df.count() for t, df in tiers.items()}
    engine_sec = time.perf_counter() - t0
    n_points = sum(points.values())
    timings["engine_rollup_cascade"] = round(engine_sec, 4)

    # flagship fused path: gap-fill + per-doc 3-tier rollup, shuffle-free,
    # written partitioned by tier (the BASELINE.json headline metric)
    fused_docs = int(os.environ.get("SPARK_GRAFT_FUSED_DOCS", "10000"))
    fseq = generate_sequences(spark, fused_docs, partitions=cpus * 2)
    fseq.write.mode("overwrite").parquet("/tmp/bench_fused_seq.parquet")
    fstored = spark.read.parquet("/tmp/bench_fused_seq.parquet")
    t0 = time.perf_counter()
    gapfill_tiers(fstored, knockout=0.1).write.mode("overwrite").partitionBy(
        "tier"
    ).parquet("/tmp/bench_fused_tiers")
    fused_sec = time.perf_counter() - t0
    fused_points = spark.read.parquet("/tmp/bench_fused_tiers").count()
    timings["engine_fused_gapfill_tiers"] = round(fused_sec, 4)

    # Gorilla compression ratio, per series shape:
    # (a) sparse irregular observation segments (11-17 obs/doc) — little
    #     delta-of-delta regularity, ratio ~1.5;
    # (b) dense hourly rollup output (the workload the codec targets) —
    #     timestamps collapse to ~1 bit (delta-of-delta = 0) and the
    #     ratio is bounded by value-XOR entropy on the smooth
    #     reconstruction, ~2.2x. A deterministic 1-in-20 doc sample of
    #     the fused hourly tier keeps the metric pass bounded.
    comp_obs = decode_observations_arrow(generate_sequences(spark, 5000, partitions=cpus))
    comp = compress_segments(comp_obs).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    compression_ratio = round(comp["raw"] / comp["enc"], 3)
    hourly_dense = (
        spark.read.parquet("/tmp/bench_fused_tiers")
        .filter(
            (F.col("tier") == "hourly")
            & (F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0)
        )
        .select(
            "source", "doc_id",
            F.col("bucket_ts").alias("ts"),
            F.col("mean_value").alias("value"),
        )
    )
    comp_h = compress_segments(hourly_dense).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    compression_ratio_hourly = round(comp_h["raw"] / comp_h["enc"], 3)
    # quantized mode (value_grid=1/512, max abs error 2^-10): the lossy
    # knob for smooth reconstructions; lossless stays the default
    comp_q = compress_segments(comp_obs, value_grid=1 / 512.0).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    comp_hq = compress_segments(hourly_dense, value_grid=1 / 512.0).agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    ratio_q = round(comp_q["raw"] / comp_q["enc"], 3)
    ratio_hq = round(comp_hq["raw"] / comp_hq["enc"], 3)

    total = round(sum(timings.values()), 4)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "engine": {
            "docs": ENGINE_DOCS,
            "rolled_points": n_points,
            "points_per_tier": points,
            "points_per_sec": round(n_points / engine_sec, 1),
            "sequences_per_sec": round(ENGINE_DOCS / engine_sec, 1),
            "fused": {
                "docs": fused_docs,
                "rolled_points": fused_points,
                "points_per_sec": round(fused_points / fused_sec, 1),
                "sequences_per_sec": round(fused_docs / fused_sec, 1),
            },
            "gorilla_compression_ratio": compression_ratio,
            "gorilla_compression_ratio_dense_hourly": compression_ratio_hourly,
            "gorilla_quantized_ratio": ratio_q,
            "gorilla_quantized_ratio_dense_hourly": ratio_hq,
        },
        "cpus": cpus,
        "host_probe_M_per_s": {
            "before": probe_before,
            "after": _probe_host(),
            "healthy_reference": 280.0,
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
