#!/usr/bin/env python
"""Per-host-window bracketing for the two ENGINE bench rows
(engine_rollup_cascade, engine_fused_gapfill_tiers) — the r4 VERDICT's
task #2: the fused row moved 3.61 s (r3 driver) -> 5.54 s (r4 driver)
while committed local runs bracketed 3.12-4.66 s, and this host has
minutes-scale throttle windows, so a single driver timing cannot
distinguish a plan regression from a slow window. Protocol (same as
bench_results/bench_windows_r4.json, which settled minhash/spatial):

  - 32-way CPU burn probe (M iters/s) BEFORE and AFTER each window —
    a window whose probes sag is a throttled window, not a plan change
  - inside each window: warm + time both engine jobs exactly as
    bench.py times them (same doc counts, same materialized sinks)
  - N windows (default 3) separated by a cool-down sleep so different
    host windows are sampled

Writes bench_results/bench_windows_r5.json. Usage:
    python tools/bench_windows_engine.py [n_windows] [gap_seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling_calibrated import probe_capacity  # noqa: E402

from sentinel2_crop_trait_timeseries_spark.session import get_spark  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.sources.gen import generate_sequences  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.decode import decode_observations_arrow  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.rollup import cascade  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.operators.gapfill import gapfill_tiers  # noqa: E402

ENGINE_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "300000"))
FUSED_DOCS = int(os.environ.get("SPARK_GRAFT_FUSED_DOCS", "10000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "bench_windows_r5.json",
)


def _time_engine_jobs(spark) -> dict[str, float]:
    seq_stored = spark.read.parquet("/tmp/benchw_seq.parquet")
    fstored = spark.read.parquet("/tmp/benchw_fused_seq.parquet")
    times: dict[str, float] = {}

    t0 = time.perf_counter()
    tiers = cascade(
        decode_observations_arrow(seq_stored),
        materialize_dir="/tmp/benchw_tiers", spark=spark,
    )
    n_points = sum(df.count() for df in tiers.values())
    times["engine_rollup_cascade"] = round(time.perf_counter() - t0, 3)
    times["cascade_points_per_sec"] = round(
        n_points / times["engine_rollup_cascade"], 1
    )

    t0 = time.perf_counter()
    gapfill_tiers(fstored, knockout=0.1).write.mode("overwrite").partitionBy(
        "tier"
    ).parquet("/tmp/benchw_fused_tiers")
    fused_sec = time.perf_counter() - t0
    fused_points = spark.read.parquet("/tmp/benchw_fused_tiers").count()
    times["engine_fused_gapfill_tiers"] = round(fused_sec, 3)
    times["fused_points_per_sec"] = round(fused_points / fused_sec, 1)
    return times


def main() -> None:
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    gap = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0

    spark = get_spark("bench_windows", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    generate_sequences(spark, ENGINE_DOCS, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet("/tmp/benchw_seq.parquet")
    generate_sequences(spark, FUSED_DOCS, partitions=CPUS * 2).write.mode(
        "overwrite"
    ).parquet("/tmp/benchw_fused_seq.parquet")
    _time_engine_jobs(spark)  # warm: JIT, parquet footers, shuffle dirs

    pool = mp.Pool(32)
    probe_capacity(pool)  # warm the pool
    windows = []
    for wdx in range(n_windows):
        if wdx:
            time.sleep(gap)
        c0 = probe_capacity(pool)
        times = _time_engine_jobs(spark)
        c1 = probe_capacity(pool)
        windows.append(
            {
                "window": wdx,
                "probe_before_M_per_s": round(c0, 1),
                "probe_after_M_per_s": round(c1, 1),
                "times_sec": times,
            }
        )
        print(f"[window {wdx}] probes {c0:.1f}/{c1:.1f} M/s  {times}")

    out = {
        "purpose": (
            "r5 task: bracket engine_rollup_cascade + "
            "engine_fused_gapfill_tiers across capacity-probed host "
            "windows (r4 driver artifact showed fused 3.61->5.54 s; "
            "plan asserts unchanged, suspicion = host window)"
        ),
        "engine_docs": ENGINE_DOCS,
        "fused_docs": FUSED_DOCS,
        "master": f"local[{CPUS}]",
        "windows": windows,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")
    pool.close()
    spark.stop()


if __name__ == "__main__":
    main()
