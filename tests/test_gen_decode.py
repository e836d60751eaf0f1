"""Generator determinism + token codec round-trip (the per-row invariant)."""

import numpy as np

from sentinel2_crop_trait_timeseries_spark.operators.decode import (
    decode_observations,
    encode_sequences,
    roundtrip_mismatches,
)
from sentinel2_crop_trait_timeseries_spark.operators.oracle import decode_doc
from sentinel2_crop_trait_timeseries_spark.sources.gen import (
    EPOCH_UNIX,
    generate_sequences,
    generate_sequences_local,
)

N = 120


def test_gen_matches_local_twin(spark):
    got = generate_sequences(spark, N, partitions=3).toPandas()
    got = got.sort_values("doc_id").reset_index(drop=True)
    exp = generate_sequences_local(N).sort_values("doc_id").reset_index(drop=True)
    assert (got["doc_id"] == exp["doc_id"]).all()
    assert (got["source"] == exp["source"]).all()
    assert (got["n_tok"] == exp["n_tok"]).all()
    for a, b in zip(got["tokens"], exp["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_gen_partition_invariance(spark):
    a = generate_sequences(spark, N, partitions=1).toPandas().sort_values("doc_id")
    b = generate_sequences(spark, N, partitions=7).toPandas().sort_values("doc_id")
    for x, y in zip(a["tokens"], b["tokens"]):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_obs_shape_matches_reference_workload(spark):
    pdf = generate_sequences_local(500)
    n_obs = pdf["n_tok"] // 2
    assert n_obs.min() >= 11 and n_obs.max() <= 17  # SURVEY §6: 11-17 obs/pixel
    assert (pdf["source"] == "src_hot").mean() > 0.2  # deliberate skew


def test_decode_matches_oracle(spark):
    seq = generate_sequences(spark, 30, partitions=2)
    obs = decode_observations(seq).toPandas()
    seq_pdf = seq.toPandas()
    for _, row in seq_pdf.iterrows():
        hours, vals = decode_doc(row["tokens"])
        mine = obs[obs.doc_id == row["doc_id"]].sort_values("ts")
        got_hours = (mine["ts"].astype("int64") // 10**9 - EPOCH_UNIX) // 3600
        assert np.array_equal(got_hours.to_numpy(), hours)
        assert np.allclose(mine["value"].to_numpy(), vals)


def test_roundtrip_invariant(spark):
    seq = generate_sequences(spark, 200, partitions=5)
    res = roundtrip_mismatches(seq).collect()[0]
    assert res["n_docs"] == 200
    assert res["n_mismatch"] == 0


def test_encode_is_exact_inverse(spark):
    seq = generate_sequences(spark, 50, partitions=2)
    re_enc = encode_sequences(decode_observations(seq)).toPandas().sort_values("doc_id")
    orig = seq.toPandas().sort_values("doc_id")
    for a, b in zip(orig["tokens"], re_enc["tokens"]):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_arrow_decode_equals_column_decode(spark):
    from sentinel2_crop_trait_timeseries_spark.operators.decode import (
        decode_observations,
        decode_observations_arrow,
    )
    from sentinel2_crop_trait_timeseries_spark.sources.gen import (
        generate_sequences,
    )

    seq = generate_sequences(spark, 150, partitions=4)
    a = decode_observations(seq)
    b = decode_observations_arrow(seq)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
