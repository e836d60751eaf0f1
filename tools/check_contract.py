"""Local stand-in for the driver's correctness gate: run every catalog
query on Spark AND its DuckDB oracle, compare row-count / column set /
order-insensitive values. Usage: python tools/check_contract.py [sf_dir] [name...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if len(a) != len(b):
        return f"row count {len(a)} vs {len(b)}"
    if sorted(a.columns) != sorted(b.columns):
        return f"columns {sorted(a.columns)} vs {sorted(b.columns)}"
    ca, cb = canon(a), canon(b)
    for c in ca.columns:
        va, vb = ca[c].to_numpy(), cb[c].to_numpy()
        if pd.api.types.is_float_dtype(ca[c]):
            na, nb = pd.isna(va), pd.isna(vb)
            if not (na == nb).all():
                return f"col {c}: null mismatch"
            if not np.allclose(va[~na].astype(float), vb[~nb].astype(float),
                               rtol=0, atol=1e-6):
                bad = np.flatnonzero(~np.isclose(va[~na].astype(float),
                                                 vb[~nb].astype(float),
                                                 rtol=0, atol=1e-6))[:3]
                return f"col {c}: value mismatch at {bad}: {va[~na][bad]} vs {vb[~nb][bad]}"
        else:
            eq = pd.Series(va).astype(str) == pd.Series(vb).astype(str)
            if not eq.all():
                i = int(np.flatnonzero(~eq.to_numpy())[0])
                return f"col {c}: value mismatch row {i}: {va[i]!r} vs {vb[i]!r}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    from sentinel2_crop_trait_timeseries_spark.session import get_spark

    spark = get_spark(app_name="contract-check", master="local[8]",
                      shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"weak {name}: rows={len(sdf)} (no oracle)")
            n_weak += 1
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = compare(sdf, odf)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"ok   {name}: rows={len(sdf)}")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_weak} weak, {n_fail} FAILED")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
