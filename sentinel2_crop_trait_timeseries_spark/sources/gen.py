"""Deterministic synthetic ``sequences`` table generator.

Input shape mandated by the engine contract:
``(doc_id string, tokens array<int32>, n_tok int32, source string)``.

Token encoding (fixed, documented, exactly round-trippable):
``tokens = [dt_0, v_0, dt_1, v_1, ...]`` where ``dt_0`` is whole hours
since 2022-01-01T00:00:00Z, each subsequent ``dt_k`` is whole hours
since the previous observation, and ``v_k = round(value * 1000)`` as
int32. Decoding therefore reproduces the observation series
``(ts_k, value_k)`` exactly, and re-encoding reproduces the token array
bit-for-bit (the per-row invariant).

The synthetic series mirror the reference workload's shape
(/root/reference: per-pixel sparse LAI trajectories,
``results/validation_sites/farm_*/raw_lai_values.csv``): 11-17
observations per doc spread over ~an 83-day season, values following a
rising-then-flattening growth curve with per-doc noise — see
``src/04_reconstruct_s2_traits.py:416-427`` for the reference series
shape. Everything is keyed off splitmix64(seed, doc_index): no global
RNG, so generation is identical under any partitioning (fixes the
reference's order-dependent ``np.random.seed(42)``,
``src/04_reconstruct_s2_traits.py:36-37``).

Skew is deliberate: ``hot_share`` of docs land in one hot ``source``
(mirrors the reference's 3x parcel-size imbalance, SURVEY.md §6) so the
salting/AQE path is exercised.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

EPOCH = np.datetime64("2022-01-01T00:00:00", "s")
EPOCH_UNIX = 1640995200  # 2022-01-01T00:00:00Z
MIN_OBS, MAX_OBS = 11, 17
VALUE_SCALE = 1000.0

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain PRNG)."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the algorithm
        z = (np.asarray(x, dtype=np.uint64) + _SM_GAMMA)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        return z ^ (z >> np.uint64(31))


def _mix(i: np.ndarray, seed: int, stream: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        salt = np.uint64(seed) + np.uint64(stream) * _SM_GAMMA
    return splitmix64(i.astype(np.uint64) ^ splitmix64(salt))


def gen_batch(idx: np.ndarray, seed: int = 42, n_sources: int = 20,
              hot_share: float = 0.3) -> pd.DataFrame:
    """Generate sequence rows for doc indices ``idx`` (vectorized numpy).

    Returns a pandas frame with columns doc_id/tokens/n_tok/source.
    """
    n = len(idx)
    i = idx.astype(np.uint64)

    n_obs = (MIN_OBS + (_mix(i, seed, 1) % np.uint64(MAX_OBS - MIN_OBS + 1))).astype(np.int64)
    src_u = (_mix(i, seed, 2) % np.uint64(1000)).astype(np.int64)
    hot_cut = int(hot_share * 1000)
    src_id = (_mix(i, seed, 3) % np.uint64(n_sources)).astype(np.int64)

    # season start: ~Mar 20 (hour-of-year 1896) +- ~40 days, whole hours
    h0 = (1896 + (_mix(i, seed, 4) % np.uint64(2000)).astype(np.int64) - 1000)

    m = MAX_OBS
    rows = np.arange(m, dtype=np.uint64)[None, :]
    key = i[:, None] * np.uint64(MAX_OBS + 1) + rows
    # gaps between obs: 24..263 hours (1-11 days), like 11-17 passes over ~83 days
    gaps = (24 + (_mix(key.ravel(), seed, 5).reshape(n, m) % np.uint64(240))).astype(np.int64)
    # growth-curve values: logistic rise 0.2 -> ~6.5 with per-obs noise
    frac = np.arange(m, dtype=np.float64)[None, :] / (np.maximum(n_obs, 2) - 1)[:, None]
    noise = ((_mix(key.ravel(), seed, 6).reshape(n, m) % np.uint64(400)).astype(np.float64) - 200.0) / 1000.0
    vals = 0.2 + 6.3 / (1.0 + np.exp(-8.0 * (frac - 0.45))) + noise
    v_int = np.round(np.clip(vals, 0.0, 12.0) * VALUE_SCALE).astype(np.int64)

    mask = rows.astype(np.int64) < n_obs[:, None]
    dts = gaps.copy()
    dts[:, 0] = h0

    # interleave [dt, v] pairs, trimmed per-doc
    inter = np.empty((n, 2 * m), dtype=np.int32)
    inter[:, 0::2] = dts.astype(np.int32)
    inter[:, 1::2] = v_int.astype(np.int32)
    counts = (2 * n_obs).astype(np.int64)
    keep = np.repeat(rows.repeat(2, axis=1)[0][None, :], n, axis=0) < n_obs[:, None].repeat(2 * m, axis=1)
    # simpler mask: column pair index < n_obs
    pair_idx = np.repeat(np.arange(m), 2)[None, :]
    keep = pair_idx < n_obs[:, None]
    flat = inter[keep]
    tokens = np.split(flat, np.cumsum(counts)[:-1])

    sources = np.where(
        src_u < hot_cut, "src_hot",
        np.char.add("src_", src_id.astype(str)),
    )
    return pd.DataFrame(
        {
            "doc_id": np.char.add("doc_", idx.astype(np.int64).astype(str)),
            "tokens": tokens,
            "n_tok": counts.astype(np.int32),
            "source": sources,
        }
    )


SEQ_SCHEMA = "doc_id string, tokens array<int>, n_tok int, source string"


def generate_sequences(spark, n_docs: int, seed: int = 42, n_sources: int = 20,
                       hot_share: float = 0.3, partitions: int | None = None):
    """Distributed deterministic generation: spark.range -> mapInPandas.

    Identical output for any ``partitions`` value (per-doc hashing, no
    global RNG) — the property the reference lacks.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    base = spark.range(0, n_docs, 1, partitions)

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield gen_batch(pdf["id"].to_numpy(), seed=seed,
                            n_sources=n_sources, hot_share=hot_share)

    return base.mapInPandas(gen, schema=SEQ_SCHEMA)


def generate_sequences_local(n_docs: int, seed: int = 42, n_sources: int = 20,
                             hot_share: float = 0.3) -> pd.DataFrame:
    """Single-process oracle twin of ``generate_sequences``."""
    return gen_batch(np.arange(n_docs), seed=seed, n_sources=n_sources,
                     hot_share=hot_share)
