"""Sequence packing (concat-and-chunk) + vocab coverage: semantic
invariants and the scale properties of the two-level prefix-sum plan.

Reference analog: the per-tile ordered time-stack assembly before
interpolation (src/02_extract_s2_traits.py builds one ordered cube per
tile from per-scene rasters; here one token stream per source from
docs)."""

import re

from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_docs  # noqa: F401
from sentinel2_crop_trait_timeseries_spark.catalog_docs import _PACK_W

SF = "/root/testdata/sf0.001"


def test_pack_chunks_invariants(spark):
    m = QUERIES["pack_chunks_manifest"]["fn"](spark, SF).cache()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ws = F.filter(F.split("text", r"\s+"), lambda x: x != "")
    tok = docs.select("source", F.size(ws).cast("long").alias("n"))

    # token mass is conserved: sum over chunks == sum over docs
    per_src = {
        r["source"]: r["s"]
        for r in tok.groupBy("source").agg(F.sum("n").alias("s")).collect()
    }
    got = {
        r["source"]: r["s"]
        for r in m.groupBy("source").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert got == per_src

    # chunk ids are dense 0..last and every chunk except the per-source
    # last is exactly full
    for src, rows in _by_source(m):
        rows.sort(key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        assert all(r["n_tokens"] == _PACK_W for r in rows[:-1])
        assert 0 < rows[-1]["n_tokens"] <= _PACK_W
        # doc extents tile the stream in order: first_doc of chunk k+1
        # >= first_doc of chunk k, and each chunk has >= 1 starting doc
        # unless a single long doc spans it entirely
        for a, b in zip(rows, rows[1:]):
            assert b["first_doc"] >= a["first_doc"]
            assert b["last_doc"] >= a["last_doc"]
        assert all(
            r["n_starting"] >= 1 or r["n_docs"] == 1 for r in rows
        )
    m.unpersist()


def _by_source(m):
    rows = m.collect()
    by = {}
    for r in rows:
        by.setdefault(r["source"], []).append(r.asDict())
    return by.items()


def test_pack_plan_has_no_per_source_doc_window(spark):
    """The doc-level cumsum window must be partitioned by (source,
    bucket), never by source alone — one-task-per-source is the
    scale-killer the two-level design exists to avoid. The only
    source-partitioned window allowed is the one over the 64x-smaller
    bucket-totals table, which must arrive broadcast."""
    qe = QUERIES["pack_chunks_manifest"]["fn"](spark, SF)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    wins = re.findall(r"Window \[.*?windowspecdefinition\(([^)]*)\)", plan)
    doc_level = [w for w in wins if "doc_id" in w]
    assert doc_level, plan
    assert all("b#" in w or " b " in w for w in doc_level), doc_level
    assert "BroadcastHashJoin" in plan  # bucket offsets join is broadcast


def test_vocab_top_is_take_ordered(spark):
    """Global top-100 must plan as TakeOrderedAndProject (per-partition
    top-K + driver merge), never a full global Sort of the vocab."""
    qe = QUERIES["vocab_top_coverage"]["fn"](spark, SF)._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = QUERIES["vocab_top_coverage"]["fn"](spark, SF).collect()
    rows.sort(key=lambda r: r["rank"])
    # cumulative counts are the running sum of a non-increasing series
    cnts = [r["cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    assert rows[-1]["cum_cnt"] == sum(cnts)
    assert all(r["cum_cnt"] <= r["total_tokens"] for r in rows)


def test_pack_chunk_tokens_agrees_with_manifest(spark):
    """The fingerprinted chunks and the manifest describe the same
    packing: identical (source, chunk_id) key set and identical token
    counts per chunk."""
    m = {
        (r["source"], r["chunk_id"]): r["n_tokens"]
        for r in QUERIES["pack_chunks_manifest"]["fn"](spark, SF).collect()
    }
    t = {
        (r["source"], r["chunk_id"]): r["n_tok_chunk"]
        for r in QUERIES["pack_chunk_tokens"]["fn"](spark, SF).collect()
    }
    assert t == m


def test_pack_chunk_digest_is_order_sensitive(spark):
    """Digests are distinct across chunks (the md5 actually encodes
    content, not just counts): full chunks share n_tok_chunk=256 but
    no two full chunks in the fixture share a digest."""
    rows = QUERIES["pack_chunk_tokens"]["fn"](spark, SF).collect()
    full = [r["chunk_md5"] for r in rows if r["n_tok_chunk"] == _PACK_W]
    assert len(full) == len(set(full)) and len(full) > 0
