"""Edge inputs for the curation queries: degenerate docs and the empty
corpus, run through the same catalog entries the driver exercises.
(The sf fixtures never produce <3-word docs or all-duplicate corpora,
so these paths are pinned here.)"""

import os

import pytest

from pyspark.sql import Row

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_docs  # noqa: F401

_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def _mkdocs(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "documents.parquet"))
    return d


def _row(doc_id, text, source="web"):
    return Row(
        doc_id=doc_id, text=text, lang="en", source=source,
        n_chars=len(text),
    )


def test_degenerate_docs(spark, tmp_path):
    sf = _mkdocs(
        spark,
        tmp_path,
        [
            _row(1, "one"),                      # 1 word: no shingles
            _row(2, "a b c"),                    # exactly 3 words
            _row(3, " ".join(["w%d" % i for i in range(11)])),  # 8+3 words
            _row(4, "x " * 16),                  # one word repeated 16x
        ],
    )
    rep = {r["doc_id"]: r for r in
           QUERIES["doc_repetition_ratio"]["fn"](spark, sf).collect()}
    assert 1 not in rep                          # <3 words filtered
    assert rep[2]["n_shingles"] == 1 and rep[2]["dup_shingle_frac"] == 0.0
    assert rep[3]["n_shingles"] == 9
    assert rep[4]["dup_word_frac"] > 0.9         # 16 copies of one word
    assert rep[4]["dup_shingle_frac"] > 0.9

    spans = {r["doc_id"]: r for r in
             QUERIES["dedup_span_exact"]["fn"](spark, sf).collect()}
    assert spans[1]["n_spans"] == 1              # partial block still a span
    assert spans[3]["n_spans"] == 2              # 8 + 3 words -> 2 blocks
    assert spans[2]["n_dup_spans"] == 0

    shard = QUERIES["shard_shuffle_assign"]["fn"](spark, sf).collect()
    assert len(shard) == 4 and len({r["doc_id"] for r in shard}) == 4


def test_identical_docs_fully_flagged(spark, tmp_path):
    text = " ".join(["tok%d" % i for i in range(20)])
    sf = _mkdocs(spark, tmp_path, [_row(i, text) for i in range(1, 4)])
    for r in QUERIES["dedup_span_exact"]["fn"](spark, sf).collect():
        assert r["dup_span_frac"] == 1.0         # every span occurs 3x
    for r in QUERIES["doc_repetition_ratio"]["fn"](spark, sf).collect():
        assert r["dup_shingle_frac"] == 0.0      # within-doc still unique


def test_empty_corpus_no_crash(spark, tmp_path):
    sf = _mkdocs(spark, tmp_path, [])
    for name in (
        "doc_repetition_ratio",
        "dedup_span_exact",
        "shard_shuffle_assign",
        "quality_lm_perplexity",
        "decontaminate_overlap",
        "bpe_encode_tokens",
        "bpe_train_merges",
    ):
        assert QUERIES[name]["fn"](spark, sf).count() == 0, name


def test_partition_invariance_of_new_curation_ops(spark):
    """Shuffle-partition count must not change any output value —
    the order-independence claim behind every exact-integer /
    single-division output, pinned the same way the engine pins
    gapfill chunking."""
    sf = "/root/testdata/sf0.001"
    names = (
        "doc_repetition_ratio",
        "dedup_span_exact",
        "shard_shuffle_assign",
        "quality_decile_thresholds",
        "tfidf_top_terms",
        "embedding_outlier_zscore",
    )
    def snap(n_part):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_part))
        try:
            return {
                name: sorted(
                    map(tuple, QUERIES[name]["fn"](spark, sf).collect())
                )
                for name in names
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a, b = snap(3), snap(32)
    for name in names:
        assert a[name] == b[name], name
