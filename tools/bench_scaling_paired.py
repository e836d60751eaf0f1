#!/usr/bin/env python
"""Paired-ratio scaling measurement (BASELINE.json north_rule).

The sandbox host delivers BURSTY CPU: identical back-to-back runs swing
4-25x (documented in BENCH.md), and the swing windows last minutes.
That breaks the min-of-N-per-level design — each level's minimum comes
from a different time window, so the cross-level ratio compares host
states, not core counts (observed: an 8-core run in a turbo window
beating every 32-core run).

This harness instead runs the two levels BACK-TO-BACK inside each pair
(8-core run, then 32-core run, ~1 min apart) and reports the MEDIAN of
the per-pair time ratios. A pair almost always lands inside one host
window, so its ratio isolates the core-count effect; pairs that
straddle a window boundary become outliers the median discards.

The job is the flagship engine pass (sequences -> fused gap-fill ->
3-tier per-doc rollup) against the noop sink: the sandbox's single
local disk is a non-scaling sink a real cluster doesn't have, and its
constant ~40 s write flattens any scaling signal (see bench_scaling.py
SCALING_SINK). Usage:

    python tools/bench_scaling_paired.py [n_docs] [low] [high] [pairs]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentinel2_crop_trait_timeseries_spark.session import get_spark  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.gapfill import gapfill_tiers  # noqa: E402

SEQ_PATH = "/tmp/scaling_seq_paired.parquet"


def run_once(cores: int) -> float:
    """One timed flagship run at `cores` (fresh context, noop sink)."""
    spark = get_spark(
        f"s2tt_pair_{cores}", master=f"local[{cores}]", shuffle_partitions=cores
    )
    t0 = time.perf_counter()
    seq = spark.read.parquet(SEQ_PATH)
    gapfill_tiers(seq, knockout=0.1).write.format("noop").mode("overwrite").save()
    sec = time.perf_counter() - t0
    spark.stop()
    return sec


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    high = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    n_pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 12

    gen = get_spark("s2tt_pair_gen", master=f"local[{high}]",
                    shuffle_partitions=high)
    generate_sequences(gen, n_docs, partitions=high * 2).write.mode(
        "overwrite"
    ).parquet(SEQ_PATH)
    seq = gen.read.parquet(SEQ_PATH)
    points = (
        gapfill_tiers(seq, knockout=0.1).groupBy("tier").count().collect()
    )
    n_points = sum(r["count"] for r in points)
    gen.stop()

    # one untimed warm-up pair (JIT, python worker pools, page cache)
    run_once(low)
    run_once(high)

    pairs = []
    for i in range(n_pairs):
        t_low = run_once(low)
        t_high = run_once(high)
        pairs.append({"low_sec": round(t_low, 2), "high_sec": round(t_high, 2),
                      "ratio": round(t_low / t_high, 3)})
        print(f"pair {i + 1}/{n_pairs}: {low}c {t_low:.1f}s  "
              f"{high}c {t_high:.1f}s  ratio {t_low / t_high:.2f}",
              file=sys.stderr, flush=True)

    ratios = [p["ratio"] for p in pairs]
    med = statistics.median(ratios)
    ideal = high / low
    med_high = statistics.median(p["high_sec"] for p in pairs)
    med_low = statistics.median(p["low_sec"] for p in pairs)
    out = {
        "job": "fused gapfill + per-doc 3-tier rollup (narrow, noop sink)",
        "methodology": "median of per-pair back-to-back time ratios "
                       "(robust to the host's minutes-long throttle windows)",
        "n_docs": n_docs,
        "rolled_points": n_points,
        "low_cores": low,
        "high_cores": high,
        "pairs": pairs,
        "median_ratio": round(med, 3),
        "ideal_speedup": ideal,
        "scaling_efficiency": round(med / ideal, 3),
        "median_low_sec": round(med_low, 2),
        "median_high_sec": round(med_high, 2),
        "points_per_sec_low_median": round(n_points / med_low, 1),
        "points_per_sec_high_median": round(n_points / med_high, 1),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
