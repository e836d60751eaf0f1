#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual catalog
queries with the noop sink so the computation is measured, not the
count()-pruned plan or a real sink. NOT the frozen driver bench —
numbers here are cited in OPTIMIZATION_r06.md only.

Usage:
  python bench_extra.py q1 q2 ...          # time named queries
  python bench_extra.py --explain q1       # dump .explain("formatted")
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
     REPEAT (default 1 timed run after 1 warm run; REPEAT=0 -> no warm).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sentinel2_crop_trait_timeseries_spark.session import get_spark  # noqa: E402
from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES  # noqa: E402


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = [a for a in sys.argv[1:]]
    explain = "--explain" in args
    count_mode = "--count" in args  # mirror frozen bench.py methodology
    args = [a for a in args if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeat = int(os.environ.get("REPEAT", "1"))
    spark = get_spark("s2tt_bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    sc = spark.sparkContext

    out: dict[str, object] = {"sf_dir": sf_dir, "queries": {}}
    for name in args:
        fn = QUERIES[name]["fn"]
        if explain:
            print(f"===== {name} =====")
            print(fn(spark, sf_dir)._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
            continue
        sc.setJobDescription(f"{name}: warm")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        if count_mode:
            df.count()
        else:
            noop(df)
        warm = time.perf_counter() - t0
        times = []
        for i in range(repeat):
            sc.setJobDescription(f"{name}: timed {i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if count_mode:
                df.count()
            else:
                noop(df)
            times.append(round(time.perf_counter() - t0, 4))
        sc.setJobDescription(None)
        out["queries"][name] = {"warm": round(warm, 4), "timed": times}
        print(json.dumps({name: out["queries"][name]}), flush=True)
    print("RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
