"""LSH banding skew guard: an n-clone cluster concentrates in one
bucket and makes the band self-join quadratic (n^2 pairs). The
bucket_cap representative capping must bound candidates linearly
while keeping every clone connected to a representative — and must be
a no-op when the cap exceeds every bucket (exact-semantics check)."""

from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.catalog_docs import (
    _minhash_lsh_pairs,
    _simhash_pairs,
)

CLONES = 1000
CAP = 4


def _fixture(spark):
    clone_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, clone_text) for i in range(CLONES)] + [
        (CLONES + i, f"unique document number {i} talks about topic_{i} "
                     f"and mentions entity_{i * 7} plus filler_{i * 13}")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_cap_bounds_pairs_and_keeps_connectivity(spark):
    d = _fixture(spark)
    capped = _minhash_lsh_pairs(d, bucket_cap=CAP).cache()
    # uncapped the clone bucket alone yields C(1000,2) ~ 500k pairs;
    # capped: <= CAP * (n-1) clone-touching pairs per band, band dupes
    # merged by the groupBy (the 50 filler docs share template words
    # and add a few dozen pairs of their own — counted separately)
    n_clone_pairs = capped.filter(
        (F.col("doc_a") < CLONES) | (F.col("doc_b") < CLONES)
    ).count()
    assert n_clone_pairs <= CAP * (CLONES - 1)
    # every clone still reachable from a representative (star pairs)
    touched = (
        capped.select(F.col("doc_a").alias("d")).union(
            capped.select(F.col("doc_b").alias("d"))
        ).filter(F.col("d") < CLONES).distinct().count()
    )
    assert touched == CLONES
    capped.unpersist()


def test_minhash_cap_is_noop_when_buckets_fit(spark):
    d = _fixture(spark).filter(F.col("doc_id") % 97 < 5)  # small corpus
    exact = {tuple(r) for r in _minhash_lsh_pairs(d).collect()}
    wide = {tuple(r) for r in _minhash_lsh_pairs(d, bucket_cap=10**6).collect()}
    assert exact == wide


def test_simhash_cap_is_noop_when_buckets_fit(spark):
    # cross-validates the exact CLASS-collapse path (cap=None) against
    # the doc-level banding path (cap too wide to ever trigger)
    d = _fixture(spark).filter(F.col("doc_id") % 97 < 5)  # small corpus
    exact = {tuple(r) for r in _simhash_pairs(d).collect()}
    wide = {tuple(r) for r in _simhash_pairs(d, bucket_cap=10**6).collect()}
    assert exact == wide


def test_minhash_class_collapse_handles_clone_cluster(spark):
    # the exact path enumerates the 1000-clone cluster as ONE class:
    # within-class pairs carry n_shared_bands=2 and cover all C(n,2)
    d = _fixture(spark)
    pairs = _minhash_lsh_pairs(d).filter(
        (F.col("doc_a") < CLONES) & (F.col("doc_b") < CLONES)
    )
    agg = pairs.agg(
        F.count("*").alias("n"),
        F.min("n_shared_bands").alias("lo"),
        F.max("n_shared_bands").alias("hi"),
    ).first()
    assert agg["n"] == CLONES * (CLONES - 1) // 2
    assert agg["lo"] == agg["hi"] == 2


def test_simhash_cap_bounds_pairs_and_keeps_connectivity(spark):
    d = _fixture(spark)
    capped = _simhash_pairs(d, bucket_cap=CAP).cache()
    n_clone_pairs = capped.filter(
        (F.col("doc_a") < CLONES) | (F.col("doc_b") < CLONES)
    ).count()
    assert n_clone_pairs <= CAP * (CLONES - 1)
    touched = (
        capped.select(F.col("doc_a").alias("d")).union(
            capped.select(F.col("doc_b").alias("d"))
        ).filter(F.col("d") < CLONES).distinct().count()
    )
    assert touched == CLONES
    capped.unpersist()
