"""Small-file compaction for parquet directories — the table-maintenance
half of the retention engine.

A streaming/incremental ingest (the foreachBatch cascade tiers, the
manifest-resumed pipeline) accumulates many small files per partition;
at 100 TB the resulting scan overhead (file-open cost, tiny row
groups, scheduler pressure from millions of splits) is a first-order
performance problem, which is why every production table format ships
a compaction action (Iceberg rewrite_data_files, Delta OPTIMIZE).
Reference analog: the reference re-packs its per-parcel pickle
directories between pipeline stages and skips already-processed ones
(src/04_reconstruct_s2_traits.py:556-575) — this is that step as an
idempotent engine operator.

Semantics:
- target file count = ceil(n_rows / target_rows_per_file); compaction
  runs only when the directory currently has MORE parquet files than
  that (idempotent: a second call is a no-op and says so).
- the rewrite is atomic on a POSIX filesystem: write to a sibling temp
  directory, fsync-free double rename (old -> trash, tmp -> live),
  then remove the trash. Readers see either the old or the new
  directory, never a mix. On an object store this rename is not
  atomic — production would commit through a table format's metadata
  swap instead (see sources/table_io.py's Iceberg seam); the operator
  keeps that boundary explicit rather than pretending rename works
  everywhere.
- row SET equality is the invariant (order within files may change);
  tests re-read and compare sorted rows.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def drop_expired_partitions(
    path: str,
    keep: set[str] | list[str],
    partition_col: str = "day",
) -> dict:
    """Retention expiry for a Hive-partitioned parquet directory — the
    write-side twin of rollup.retention_serving (TimescaleDB
    drop_chunks / Iceberg expire_snapshots + delete orphan files):
    remove every `<partition_col>=<value>` subdirectory whose value is
    NOT in `keep`, atomically per partition (rename to a trash sibling,
    then delete — a failed delete leaves a resumable trash dir, never a
    half-deleted live partition). Idempotent: partitions already gone
    are not errors; the report says exactly what was dropped and kept.
    The caller computes `keep` from its policy (e.g. the day values
    inside the retention horizon) — policy stays in one place, the
    storage action is mechanical.
    """
    prefix = f"{partition_col}="
    live = sorted(
        d for d in os.listdir(path)
        if d.startswith(prefix) and os.path.isdir(os.path.join(path, d))
    )
    keep_dirs = {f"{prefix}{v}" for v in keep}
    dropped = []
    for d in live:
        if d in keep_dirs:
            continue
        full = os.path.join(path, d)
        trash = full + "__expired"
        os.rename(full, trash)
        shutil.rmtree(trash)
        dropped.append(d)
    return {
        "dropped": dropped,
        "n_dropped": len(dropped),
        "n_kept": len(live) - len(dropped),
    }


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Compact `path` in place; returns an action report dict
    (action: 'compacted' | 'skip', files_before/after, n_rows)."""
    files_before = _parquet_files(path)
    df = spark.read.parquet(path)
    n_rows = df.count()
    want = max(1, math.ceil(n_rows / target_rows_per_file))
    if len(files_before) <= want:
        return {
            "action": "skip",
            "n_rows": n_rows,
            "files_before": len(files_before),
            "files_after": len(files_before),
            "target_files": want,
        }
    tmp = path.rstrip("/") + "__compact_tmp"
    trash = path.rstrip("/") + "__compact_old"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(trash, ignore_errors=True)
    # coalesce, not repartition: compaction must not pay a shuffle —
    # it only concatenates existing partitions into fewer files
    df.coalesce(want).write.mode("overwrite").parquet(tmp)
    os.rename(path, trash)
    os.rename(tmp, path)
    shutil.rmtree(trash)
    return {
        "action": "compacted",
        "n_rows": n_rows,
        "files_before": len(files_before),
        "files_after": len(_parquet_files(path)),
        "target_files": want,
    }
