"""Curation batch 2: decontamination, unigram-LM quality, mixture
weights, BPE merge training — semantic invariants beyond the oracle
hash (the oracle proves engine parity; these prove the SEMANTICS).

Reference analog: the reference's own curation steps are plausibility
filters + calibration-set splits (src/01_extract_s2_data.py quality
masks; R scripts' train/validation split); here the same roles over
the documents corpus."""

from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.catalog import QUERIES
import sentinel2_crop_trait_timeseries_spark.catalog_docs  # noqa: F401
from sentinel2_crop_trait_timeseries_spark.catalog_docs import _BPE_K

SF = "/root/testdata/sf0.001"


def test_decontaminate_never_flags_eval_docs(spark):
    rows = QUERIES["decontaminate_overlap"]["fn"](spark, SF).collect()
    for r in rows:
        assert r["doc_id"] % 97 != 0          # eval split never output
        assert r["first_eval_doc"] % 97 == 0  # hit attribution is eval-side
        assert 0 < r["n_hits"] <= r["n_shingles"]
        assert 0.0 < r["overlap_frac"] <= 1.0


def test_quality_lm_bits_bounded_by_model_size(spark):
    """Add-one smoothing bounds every token's surprisal by
    log2(T+V) (the unseen-word cost), so 0 < bits <= log2(T+V);
    OOV counts never exceed token counts."""
    import math

    df = QUERIES["quality_lm_perplexity"]["fn"](spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("w"),
    )
    tc = w.filter(F.col("doc_id") % 5 != 0).groupBy("w").count()
    t, v = tc.agg(F.sum("count"), F.count("*")).first()
    cap = math.log2(t + v)
    rows = df.collect()
    assert len(rows) == w.select("doc_id").distinct().count()
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tok"]
        assert 0.0 < r["bits_per_token"] <= cap + 1e-6


def test_mixture_weights_sum_to_one_and_order_by_size(spark):
    rows = sorted(
        QUERIES["source_mixture_weights"]["fn"](spark, SF).collect(),
        key=lambda r: r["size_rank"],
    )
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    toks = [r["n_tok"] for r in rows]
    assert toks == sorted(toks, reverse=True)
    # temperature alpha<1 compresses the spread: the largest source is
    # underweighted vs proportional, the smallest overweighted
    total = sum(toks)
    assert rows[0]["weight"] < toks[0] / total
    assert rows[-1]["weight"] > toks[-1] / total
    # epochs_at_budget is the weight/proportion ratio
    for r in rows:
        assert abs(r["epochs_at_budget"] - r["weight"] * total / r["n_tok"]) < 2e-3


def test_bpe_merges_shrink_corpus_monotonically(spark):
    rows = sorted(
        QUERIES["bpe_train_merges"]["fn"](spark, SF).collect(),
        key=lambda r: r["step"],
    )
    assert [r["step"] for r in rows] == list(range(1, _BPE_K + 1))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n0 = docs.select(
        F.sum(
            F.length(F.regexp_replace("text", r"\s+", ""))
        ).alias("n")
    ).first()["n"]
    prev = n0
    for r in rows:
        assert r["lhs"] and r["rhs"] and r["pair_cnt"] > 0
        # each merge strictly shrinks the corpus, by at most pair_cnt
        # (adjacent-pair count >= greedy non-overlapping replacement count)
        assert prev - r["pair_cnt"] <= r["corpus_symbols_after"] < prev
        prev = r["corpus_symbols_after"]
    # counts are learned in non-increasing frequency order per greedy BPE
    # over a FIXED corpus? no — merges create new symbols, so only check
    # the first merge is the global max adjacent-pair count
    w = docs.select(
        F.explode(
            F.filter(F.split("text", r"\s+"), lambda x: x != "")
        ).alias("w")
    )
    sym = w.select(
        F.split(F.trim(F.regexp_replace("w", "(.)", "$1 ")), " ").alias("a")
    )
    pair_max = (
        sym.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("a"), 1, F.size("a") - 1),
                    F.slice(F.col("a"), 2, F.size("a") - 1),
                    lambda l, r: F.concat(l, F.lit(" "), r),
                )
            ).alias("p")
        )
        .groupBy("p")
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    assert rows[0]["pair_cnt"] == pair_max


def test_bpe_partition_invariance(spark):
    """The learned merge table is identical at 1 vs 8 shuffle
    partitions (the (cnt DESC, pair ASC) tie-break removes any
    partial-agg order dependence)."""
    fn = QUERIES["bpe_train_merges"]["fn"]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        a = sorted(map(tuple, fn(spark, SF).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        b = sorted(map(tuple, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b


# ------------------------------------------------------------------
# Curation batch 3: repetition filter, epoch shard shuffle, BPE encode
# ------------------------------------------------------------------


def test_repetition_ratio_bounds_and_counts(spark):
    from pyspark.sql import functions as F

    rows = QUERIES["doc_repetition_ratio"]["fn"](spark, SF).collect()
    # the query drops <3-word docs BY DESIGN (test_curation_edges pins
    # that); compute the expected count the same way instead of baking
    # in a fixture property that every doc has >= 3 words
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != "")) >= 3
        )
        .count()
    )
    assert len(rows) == docs
    for r in rows:
        assert r["n_shingles"] == r["n_words"] - 2
        assert 1 <= r["n_shingles_distinct"] <= r["n_shingles"]
        assert 0.0 <= r["dup_word_frac"] < 1.0
        assert 0.0 <= r["dup_shingle_frac"] < 1.0
        # a doc cannot repeat shingles without repeating words
        if r["dup_shingle_frac"] > 0:
            assert r["dup_word_frac"] > 0


def test_shard_shuffle_deterministic_balanced_contiguous(spark):
    from sentinel2_crop_trait_timeseries_spark.catalog_docs import _N_SHARDS

    fn = QUERIES["shard_shuffle_assign"]["fn"]
    a = sorted(fn(spark, SF).collect(), key=lambda r: r["doc_id"])
    b = sorted(fn(spark, SF).collect(), key=lambda r: r["doc_id"])
    assert a == b  # same epoch salt -> bit-identical assignment

    by_shard = {}
    for r in a:
        assert r["shard"] == r["h_shuffle"] % _N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r)
    sizes = [len(v) for v in by_shard.values()]
    mean = len(a) / _N_SHARDS
    # invariants of the query, not of the fixture's hash draw: shard ids
    # in range, every doc assigned exactly once, and a statistical
    # balance bound (binomial tail: mean + 6*sqrt(mean) + 8 has odds
    # ~1e-9 of a false failure even across regenerated fixtures)
    assert set(by_shard) <= set(range(_N_SHARDS))
    assert sum(sizes) == len(a)
    assert max(sizes) <= mean + 6.0 * mean**0.5 + 8
    for members in by_shard.values():
        members.sort(key=lambda r: (r["h_shuffle"], r["doc_id"]))
        cum = 0
        for i, r in enumerate(members):
            cum += _doc_chars(spark, SF)[r["doc_id"]]
            assert r["pos_in_shard"] == i + 1
            assert r["cum_chars"] == cum


_CHARS_CACHE = {}


def _doc_chars(spark, sf):
    if sf not in _CHARS_CACHE:
        _CHARS_CACHE[sf] = {
            r["doc_id"]: r["n_chars"]
            for r in spark.read.parquet(f"{sf}/documents.parquet")
            .select("doc_id", "n_chars")
            .collect()
        }
    return _CHARS_CACHE[sf]


def test_bpe_encode_consistent_with_training(spark):
    """Word-weighted symbol totals of the ENCODE pass must equal the
    training query's corpus_symbols_after at the final merge step —
    the two halves of the tokenizer lifecycle agree exactly."""
    enc = QUERIES["bpe_encode_tokens"]["fn"](spark, SF).collect()
    train = QUERIES["bpe_train_merges"]["fn"](spark, SF).collect()
    assert len(train) == _BPE_K
    final_syms = max(train, key=lambda r: r["step"])["corpus_symbols_after"]
    assert sum(r["n_symbols"] for r in enc) == final_syms
    for r in enc:
        assert r["n_words"] <= r["n_symbols"] <= r["n_chars"]
        assert 0.0 < r["symbols_per_char"] <= 1.0


def test_span_dedup_flags_both_copies_and_self_repeats(spark):
    """Corpus-wide span counting must flag EVERY copy of a duplicated
    span (not n-1 of them), and a span repeated within one doc counts
    too. Cross-checked against a pandas recount of the same blocks."""
    import hashlib
    from collections import Counter

    rows = QUERIES["dedup_span_exact"]["fn"](spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert len(rows) == len(docs)

    spans_by_doc, counts = {}, Counter()
    for doc_id, text in docs.items():
        ws = [w for w in text.split() if w]
        blocks = [
            hashlib.md5(" ".join(ws[b * 8 : b * 8 + 8]).encode()).hexdigest()
            for b in range((len(ws) + 7) // 8)
        ]
        spans_by_doc[doc_id] = blocks
        counts.update(blocks)

    for r in rows:
        blocks = spans_by_doc[r["doc_id"]]
        assert r["n_spans"] == len(blocks)
        expect_dup = sum(1 for h in blocks if counts[h] > 1)
        assert r["n_dup_spans"] == expect_dup
        assert 0.0 <= r["dup_span_frac"] <= 1.0


def test_quality_deciles_exact_against_recount(spark):
    """Decile thresholds recomputed naively from the collected scores
    must agree exactly: threshold d = smallest score whose cumulative
    doc count reaches ceil(d * n / 10)."""
    import math

    scores = sorted(
        r["bits_per_token"]
        for r in QUERIES["quality_lm_perplexity"]["fn"](spark, SF).collect()
    )
    n = len(scores)
    rows = sorted(
        QUERIES["quality_decile_thresholds"]["fn"](spark, SF).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    prev = None
    for r in rows:
        target = math.ceil(r["decile"] * n / 10)
        assert r["threshold"] == scores[target - 1]
        assert r["cum_docs"] == sum(1 for s in scores if s <= r["threshold"])
        if prev is not None:
            assert r["threshold"] >= prev["threshold"]
            assert r["cum_docs"] >= prev["cum_docs"]
        prev = r
    assert rows[-1]["cum_docs"] == n


def test_tfidf_top_terms_against_recount(spark):
    """Recompute TF-IDF naively from the raw text and check the
    query's top-3 per doc matches under the same (2-dp score, n_dw,
    df, term) ordering; stopword-like max-df terms never outrank a
    rarer same-count term."""
    import math
    from collections import Counter, defaultdict

    docs = {
        r["doc_id"]: [w for w in r["text"].split() if w]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n = float(len(docs))
    df = Counter()
    for ws in docs.values():
        df.update(set(ws))

    rows = QUERIES["tfidf_top_terms"]["fn"](spark, SF).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r["doc_id"]].append(r)
    assert len(by_doc) == len(docs)

    for doc_id, got in by_doc.items():
        got.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
        cnt = Counter(docs[doc_id])
        scored = sorted(
            (
                (
                    -round(1e-9 + c * math.log(n / df[w]), 2),
                    -c,
                    df[w],
                    w,
                )
                for w, c in cnt.items()
            )
        )[:3]
        assert [s[3] for s in scored] == [r["term"] for r in got]
        for r in got:
            expect = round(1e-9 + cnt[r["term"]] * math.log(n / df[r["term"]]), 4)
            assert abs(r["tfidf"] - expect) < 1e-9


def test_embedding_outliers_recounted_in_numpy(spark):
    """Recompute the per-label centroid distances + 2-sigma flags in
    numpy on the same 1/512 grid and demand exact agreement."""
    import numpy as np

    Q = 512.0
    raw = spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    by_label = {}
    for r in raw:
        v = np.floor(np.asarray(r["embedding"], dtype=np.float64) * Q + 0.5) / Q
        by_label.setdefault(r["label"], []).append((r["vec_id"], v))

    expect = {}
    for label, members in by_label.items():
        mat = np.stack([v for _, v in members])
        cent = np.floor(mat.mean(axis=0) * Q + 0.5) / Q
        d = ((mat - cent) ** 2).sum(axis=1)
        mean, std = d.mean(), np.sqrt(max((d * d).mean() - d.mean() ** 2, 0))
        thr = round(1e-9 + mean + 2 * std, 4)
        for (vec_id, _), di in zip(members, d):
            dr = round(1e-9 + di, 4)
            expect[vec_id] = (label, dr, int(dr > thr))

    rows = QUERIES["embedding_outlier_zscore"]["fn"](spark, SF).collect()
    assert len(rows) == len(expect)
    n_out = 0
    for r in rows:
        label, dr, flag = expect[r["vec_id"]]
        assert r["label"] == label
        assert abs(r["dist"] - dr) < 1e-9
        assert r["is_outlier"] == flag
        n_out += flag
    assert 0 < n_out < len(rows) // 4  # real but sparse signal
