"""Star-edge contraction equivalence (dedup_components): every LSH
bucket is a clique, so a star from the bucket-min member spans it —
components over the star edges must equal components over the FULL
quadratic pair set, while the edge count stays linear in the corpus.
The catalog oracle proves this vs DuckDB on real data; this test
proves it Spark-vs-Spark on an adversarial clone-heavy corpus where
the quadratic/linear gap is large."""

from pyspark.sql import functions as F

from sentinel2_crop_trait_timeseries_spark.catalog_docs import (
    _minhash_band_stars,
    _minhash_lsh_pairs,
)
from sentinel2_crop_trait_timeseries_spark.operators.components import (
    connected_components,
)

CLONES = 120
N_BANDS = 4


def _fixture(spark):
    clone_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, clone_text) for i in range(CLONES)] + [
        (CLONES + i, f"unique document number {i} talks about topic_{i} "
                     f"and mentions entity_{i * 7} plus filler_{i * 13}")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_star_components_equal_full_pair_components(spark):
    d = _fixture(spark)
    nodes = d.select("doc_id")
    via_stars = {
        (r["doc_id"], r["component"])
        for r in connected_components(nodes, _minhash_band_stars(d)).collect()
    }
    via_pairs = {
        (r["doc_id"], r["component"])
        for r in connected_components(nodes, _minhash_lsh_pairs(d)).collect()
    }
    assert via_stars == via_pairs
    # the clone block is one cluster labeled by its minimum id
    assert all(c == 0 for (doc, c) in via_stars if doc < CLONES)


def test_star_edges_linear_vs_quadratic_pairs(spark):
    d = _fixture(spark)
    n_docs = d.count()
    stars = _minhash_band_stars(d).count()
    pairs = _minhash_lsh_pairs(d).count()
    # stars: at most (bucket size - 1) edges per (band, sig) bucket
    # => bounded by bands * (n_docs - 1) total, whatever the skew
    assert stars <= N_BANDS * (n_docs - 1)
    # the full pair set on the clone block is quadratic: C(120,2) = 7140
    assert pairs >= 7000
    assert stars < pairs / 10
