#!/usr/bin/env python
"""spark-submit entry point: the end-to-end curation pipeline as ONE
resumable job — quality filter -> near-dup removal (keep each LSH
component's canonical doc) -> eval-split decontamination -> 256-token
sequence packing -> epoch shard assignment.

    spark-submit --py-files s2tt_spark.zip tools/run_curation.py \
        --sf-dir /root/testdata/sf0.1 --output /path/stages \
        --manifest /path/manifest

Every stage writes its survivors (or its packed/shard artifact) to
parquet and commits its surviving row count + an exact membership
checksum to the checkpoint manifest (tier='curation', one partition
key per stage). A killed run resumes at the first uncommitted stage,
reading the previous stage's stored parquet; a completed manifest makes
the second run a no-op ("stages todo=0/5"). The per-stage counts and
checksums are EXACTLY the rows of the oracle-verified
``curation_pipeline_counts`` catalog query (tests/test_curation_pipeline
asserts the match), so the resumable job is hash-pinned to the
contract, stage by stage.
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.session import get_spark
from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_docs as cd
from sentinel2_crop_trait_timeseries_spark.operators.manifest import (
    CheckpointManifest,
)

STAGES = ["quality", "dedup_canonical", "decontaminated", "packed", "sharded"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--output", default="/tmp/s2tt_curation/stages")
    ap.add_argument("--manifest", default="/tmp/s2tt_curation/manifest")
    args = ap.parse_args()

    spark = get_spark("s2tt_curation")
    run_id = uuid.uuid4().hex[:12]
    man = CheckpointManifest(spark, args.manifest)
    done = {
        r["partition_key"]
        for r in man.done_keys("curation").collect()
    }
    todo = [s for s in STAGES if s not in done]
    print(f"[curation] run={run_id} stages todo={len(todo)}/{len(STAGES)}")
    if not todo:
        print("[curation] nothing to do; manifest complete")
        man.summary().show(truncate=False)
        spark.stop()
        return

    paths = {s: os.path.join(args.output, s) for s in STAGES}
    d = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    def commit(stage: str, n_out: int, checksum: int) -> None:
        metrics = spark.createDataFrame(
            [(stage, int(n_out))], "stage string, rows_rolled long"
        )
        man.commit_metrics(
            "curation", metrics, key_col="stage", run_id=run_id,
            lineage={"checksum": int(checksum), "sf_dir": args.sf_dir},
        )
        print(f"[curation] committed stage={stage} n_out={n_out} "
              f"checksum={checksum}")

    def ids_stats(frame):
        r = frame.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("doc_id"), F.lit(0)).alias("c"),
        ).collect()[0]
        return int(r["n"]), int(r["c"])

    # stage 1: quality (Gopher repetition + length) — same predicate as
    # curation_pipeline_counts' q1 (via the registered query's own plan)
    if "quality" in todo:
        q1 = (
            QUERIES["doc_repetition_ratio"]["fn"](spark, args.sf_dir)
            .filter((F.col("n_words") >= 10) & (F.col("dup_word_frac") <= 0.3))
            .select("doc_id")
        )
        q1.write.mode("overwrite").parquet(paths["quality"])
        commit("quality", *ids_stats(spark.read.parquet(paths["quality"])))
    q1 = spark.read.parquet(paths["quality"])

    # stage 2: near-dup removal — components over the FULL corpus (the
    # registered dedup_components plan: star edges + pointer-doubled
    # propagation), keep each component's min doc_id among survivors
    if "dedup_canonical" in todo:
        comp = QUERIES["dedup_components"]["fn"](spark, args.sf_dir)
        wmin = Window.partitionBy("component")
        q2 = (
            q1.join(comp, "doc_id")
            .withColumn("canon", F.min("doc_id").over(wmin))
            .filter(F.col("doc_id") == F.col("canon"))
            .select("doc_id")
        )
        q2.write.mode("overwrite").parquet(paths["dedup_canonical"])
        commit(
            "dedup_canonical",
            *ids_stats(spark.read.parquet(paths["dedup_canonical"])),
        )
    q2 = spark.read.parquet(paths["dedup_canonical"])

    # stage 3: decontamination — drop eval-split docs and every training
    # doc sharing a shingle with the eval split (broadcast probe)
    if "decontaminated" in todo:
        dec = QUERIES["decontaminate_overlap"]["fn"](
            spark, args.sf_dir
        ).select("doc_id")
        q3 = (
            q2.filter(F.col("doc_id") % 97 != 0)
            .join(dec, "doc_id", "left_anti")
        )
        q3.write.mode("overwrite").parquet(paths["decontaminated"])
        commit(
            "decontaminated",
            *ids_stats(spark.read.parquet(paths["decontaminated"])),
        )
    q3 = spark.read.parquet(paths["decontaminated"])

    # stage 4: sequence packing of the survivors — the real per-chunk
    # manifest (two-level prefix sum offsets, chunk explode), committed
    # as (total chunks, total packed tokens)
    if "packed" in todo:
        surv_docs = d.join(q3, "doc_id", "left_semi")
        o = cd._pack_offsets(surv_docs)
        w = F.lit(cd._PACK_W).cast("long")
        c0 = (F.col("off") / cd._PACK_W).cast("long")
        c1 = ((F.col("off") + F.col("n_tok") - 1) / cd._PACK_W).cast("long")
        x = o.select(
            "source", "doc_id", "n_tok", "off",
            F.explode(F.sequence(c0, c1)).alias("chunk_id"),
        )
        lo = F.greatest(F.col("chunk_id") * w, F.col("off"))
        hi = F.least((F.col("chunk_id") + 1) * w, F.col("off") + F.col("n_tok"))
        chunks = x.groupBy("source", "chunk_id").agg(
            F.count("*").alias("n_docs"),
            F.sum(hi - lo).alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        chunks.write.mode("overwrite").parquet(paths["packed"])
        stored = spark.read.parquet(paths["packed"])
        r = stored.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("c"),
        ).collect()[0]
        commit("packed", int(r["n"]), int(r["c"]))

    # stage 5: epoch shard assignment of the survivors (keyed hash,
    # per-shard position + cumulative byte budget — no global sort)
    if "sharded" in todo:
        h = d.join(q3, "doc_id", "left_semi").select(
            "doc_id",
            "n_chars",
            cd._h(
                F.concat(F.lit("shard:e0:"), F.col("doc_id").cast("string"))
            ).alias("h_shuffle"),
        )
        wsh = (
            Window.partitionBy(F.col("h_shuffle") % cd._N_SHARDS)
            .orderBy("h_shuffle", "doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        shards = h.select(
            "doc_id",
            "h_shuffle",
            (F.col("h_shuffle") % cd._N_SHARDS).alias("shard"),
            F.row_number().over(wsh).cast("long").alias("pos_in_shard"),
            F.sum("n_chars").over(wsh).cast("long").alias("cum_chars"),
        )
        shards.write.mode("overwrite").parquet(paths["sharded"])
        stored = spark.read.parquet(paths["sharded"])
        r = stored.agg(
            F.countDistinct("shard").alias("n"),
            F.coalesce(
                F.sum(F.col("doc_id") + F.col("shard")), F.lit(0)
            ).alias("c"),
        ).collect()[0]
        commit("sharded", int(r["n"]), int(r["c"]))

    man.summary().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
