#!/usr/bin/env python
"""BPE merge-loop cost at production merge counts (r4 VERDICT task #7).

`bpe_train_merges` registers K=6 merges — enough to oracle-check the
training recurrence, but a real tokenizer learns 10k-50k. The cost
model is O(K) driver-coordinated jobs, each a pair-count aggregation
over the *word-frequency vocab* (never the corpus stream) followed by
a 1-row collect and a localCheckpoint of the ~vocab-sized state. This
tool runs the same `_bpe_chain` loop at K=50/100/200 over the sf0.1
vocab and records seconds/merge, so the "the loop holds at scale"
claim in the bpe_train_merges docstring is a measured number, not an
extrapolation. Writes bench_results/bench_bpe_r5.json.

Usage: python tools/bench_bpe_scale.py [k1,k2,...] (default 50,200)
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
from sentinel2_crop_trait_timeseries_spark import catalog_docs  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "bench_results", "bench_bpe_r5.json",
)


def main() -> None:
    ks = (
        [int(x) for x in sys.argv[1].split(",")]
        if len(sys.argv) > 1
        else [50, 200]
    )
    spark = get_spark("bench_bpe", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    # warm: JIT + parquet footers + the K=6 registered query's own path
    catalog_docs._bpe_chain(spark, SF_DIR, 6, with_stats=True)

    pool = mp.Pool(32)
    probe_capacity(pool)  # warm
    runs = []
    for k in ks:
        p0 = probe_capacity(pool)
        t0 = time.perf_counter()
        v, rows = catalog_docs._bpe_chain(spark, SF_DIR, k, with_stats=True)
        sec = time.perf_counter() - t0
        p1 = probe_capacity(pool)
        n_vocab = v.count()
        runs.append(
            {
                "k_merges": k,
                "probe_before_M_per_s": round(p0, 1),
                "probe_after_M_per_s": round(p1, 1),
                "merges_learned": len(rows),
                "total_sec": round(sec, 2),
                "sec_per_merge": round(sec / max(len(rows), 1), 3),
                "vocab_rows": n_vocab,
                "corpus_symbols_after": rows[-1][4] if rows else None,
                "last_merge": " ".join(map(str, rows[-1][:4]))
                if rows
                else None,
            }
        )
        print(f"[k={k}] {runs[-1]}")

    out = {
        "purpose": (
            "BPE merge loop at production K (r4 VERDICT task #7): "
            "per-merge cost of the O(K)-jobs driver loop over the "
            "sf0.1 word-frequency vocab; registered query uses K=6"
        ),
        "sf_dir": SF_DIR,
        "master": f"local[{CPUS}]",
        "runs": runs,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")
    pool.close()
    spark.stop()


if __name__ == "__main__":
    main()
