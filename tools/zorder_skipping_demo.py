#!/usr/bin/env python
"""Quantify what z-order clustering buys at the file level.

Writes the events table in three physical layouts — sorted by ts
(natural ingest order), sorted by u (single-dimension clustering), and
sorted by a Morton z-value over (u, d) — then, for range predicates on
u, on d, and on both, counts the parquet ROW GROUPS whose column
min/max statistics intersect the predicate. A row group whose stats
exclude the range is never read by any stats-aware scanner (Spark's
parquet filter pushdown, Iceberg/Delta file skipping): the hit
fraction IS the I/O fraction at 100 TB.

Two production-relevant findings this demo encodes:

1. **Z-order needs NORMALIZED dimensions.** The first cut interleaved
   the raw domains (u in 0..1023, d in 267..296) and the z-sort
   degenerated to a plain u-sort: d's variation lives entirely in its
   low ~5 bits, so every high interleaved bit came from u. Measured:
   u_range frac 0.031 but d_range frac 1.0 — no better than sorting by
   u alone. This is exactly why Delta's OPTIMIZE ZORDER range-bins each
   column before interleaving. Here each dimension is bucketed to 32
   equi-width levels over its OBSERVED min/max, giving a 10-bit z
   whose bits carry comparable information from both dimensions.

2. **The honest z-order claim is about the WORST CASE over a query
   set, not any single predicate.** A dedicated single-key sort always
   beats z on its own key (finer granularity); z's value is that ONE
   layout gives useful pruning on u alone, d alone, AND both — so the
   asserted verdict is max-over-predicates(hit frac): z's worst case
   must beat every single-key layout's worst case (which is ~1.0, on
   the key it did not sort by).

Usage: python tools/zorder_skipping_demo.py [sf_dir] [n_files]
Emits one JSON document (committed as
bench_results/zorder_skipping_r5.json).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sentinel2_crop_trait_timeseries_spark.session import get_spark  # noqa: E402

_DAY_US = 86_400_000_000
_B = 32  # buckets per dimension -> 10-bit z

# u: one 16-wide user tile (selects ~1.6% of rows, u uniform 0..1023);
# d: a 4-day window inside the fixtures' 30-day span (~13% of rows) —
# both predicates are on the RAW columns; only the sort key normalizes.
_PREDICATES = {
    "u_range": ("u", 512, 527),
    "d_range": ("d", 272, 275),
}


def _zn_expr() -> str:
    """Morton interleave of the 5-bit normalized buckets ub, db."""
    terms = []
    for i in range(5):
        terms.append(f"((ub div {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((db div {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def _hit_fraction(path: str, pred_cols) -> tuple[int, int]:
    """(row groups whose stats intersect ALL predicates, total)."""
    hit = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        names = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        for rg in range(meta.num_row_groups):
            total += 1
            ok = True
            for col, lo, hi in pred_cols:
                st = meta.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # no stats -> cannot skip
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            hit += ok
    return hit, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    spark = get_spark("zorder_demo", master="local[8]", shuffle_partitions=n_files)
    e = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 1024).alias("u"),
        F.expr(
            "(cast(unix_micros(cast(ts as timestamp)) as bigint)"
            f" div {_DAY_US}) % 1024"
        ).alias("d"),
        F.col("value"),
        F.col("ts"),
    )
    # range-bin each dimension over its observed span (what OPTIMIZE
    # ZORDER does), then interleave the bucket bits
    lim = e.agg(
        F.min("u"), F.max("u"), F.min("d"), F.max("d"), F.count(F.lit(1))
    ).collect()[0]
    umin, umax, dmin, dmax, n_rows = lim
    e = e.select(
        "*",
        F.expr(f"(u - {umin}) * {_B} div {umax - umin + 1}").alias("ub"),
        F.expr(f"(d - {dmin}) * {_B} div {dmax - dmin + 1}").alias("db"),
    ).withColumn("zv", F.expr(_zn_expr()))

    base = tempfile.mkdtemp(prefix="zorder_demo_")
    layouts = {}
    for name, key in (("ts_sorted", "ts"), ("u_sorted", "u"), ("z_sorted", "zv")):
        path = os.path.join(base, name)
        (
            e.repartitionByRange(n_files, F.col(key))
            .sortWithinPartitions(key)
            .write.mode("overwrite")
            .parquet(path)
        )
        layouts[name] = path

    out = {
        "sf_dir": sf_dir,
        "n_rows": n_rows,
        "n_files": n_files,
        "buckets_per_dim": _B,
        "u_span": [umin, umax],
        "d_span": [dmin, dmax],
        "layouts": {},
    }
    for name, path in layouts.items():
        res = {}
        for pname, (col, lo, hi) in _PREDICATES.items():
            h, t = _hit_fraction(path, [(col, lo, hi)])
            res[pname] = {"hit": h, "total": t, "frac": round(h / t, 4)}
        both = [(c, lo, hi) for (c, lo, hi) in _PREDICATES.values()]
        h, t = _hit_fraction(path, both)
        res["u_and_d"] = {"hit": h, "total": t, "frac": round(h / t, 4)}
        res["worst_case"] = max(v["frac"] for v in res.values())
        out["layouts"][name] = res

    z, u, ts = (out["layouts"][k] for k in ("z_sorted", "u_sorted", "ts_sorted"))
    # the claims the demo exists to make, asserted on the measurement:
    # z-order prunes meaningfully on BOTH single-dimension predicates...
    assert z["u_range"]["frac"] < 0.5 and z["d_range"]["frac"] < 0.9, z
    # ...each single-key layout is blind on the other key...
    assert u["d_range"]["frac"] > 0.9, u
    assert ts["u_range"]["frac"] > 0.9, ts
    # ...so over the query set {u, d, u&d}, z's WORST case beats both
    assert z["worst_case"] < u["worst_case"], (z, u)
    assert z["worst_case"] < ts["worst_case"], (z, ts)
    out["verdict"] = (
        "one z-sorted layout gives useful row-group pruning on u, d, and "
        "u&d (worst-case frac {:.3f}); each single-key sort is blind on "
        "the other key (worst-case ~1.0). hit fraction == I/O fraction "
        "for any stats-aware scanner.".format(z["worst_case"])
    )
    print(json.dumps(out, indent=2))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
