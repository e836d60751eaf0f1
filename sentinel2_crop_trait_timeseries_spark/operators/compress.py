"""Gorilla-style compressed segments: delta-of-delta timestamps + XOR
float64 values, bit-packed into one BinaryType blob per series.

The reference persists reconstructed series as pickled SceneCollections
(/root/reference/src/04_reconstruct_s2_traits.py:596-599); the engine
replaces that with the Gorilla encoding (Pelkonen et al., VLDB 2015,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database") so a
rollup tier's storage footprint shrinks ~5-10x for hourly-regular
series.

Execution shape: ``compress_segments`` is a grouped Arrow-batch UDF
(``applyInPandas`` per partition key) — one blob per (key) group, no
per-row Python in the relational plan; ``decompress_segments`` is a
``mapInPandas`` iterator UDF that explodes blobs back to rows. The
bit-packing loop is per-point Python inside the Arrow batch; series per
key are small (the reference's are 11-17 obs; rollup series ~2k
points), so the loop is bounded and the Arrow transfer dominates.

Encoding (faithful Gorilla layout, 64-bit headers for simplicity):
- header: uint32 n, int64 t0 (epoch seconds), uint64 raw bits of v0
- timestamps: zigzag delta-of-delta with Gorilla's range buckets
  '0' (dod=0) | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b
- values: XOR with previous; '0' (same) | '10'+meaningful (reuse
  previous leading/length window) | '11'+5b leading+6b length+bits
"""

from __future__ import annotations

import struct
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _zigzag(x: int) -> int:
    return (x << 1) ^ (x >> 63)


def _unzigzag(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


_DOD_BUCKETS = ((7, 0b10, 2), (9, 0b110, 3), (12, 0b1110, 4))


def gorilla_encode(ts: Sequence[int], vals: Sequence[float]) -> bytes:
    """Encode parallel (epoch-second, float64) arrays into one blob.

    Timestamps are encoded in auto-detected units (GCD of the deltas):
    hour-aligned series get delta-of-deltas in hours, so regular hourly
    data costs 1 bit/point and the reference's 1-11-day gaps fit the
    small dod buckets instead of the 64-bit fallback. Lossless for any
    integer timestamps.
    """
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    n = len(ts)
    if n == 0:
        return struct.pack("<I", 0)
    vbits = vals.view(np.uint64)
    if n == 1:
        return struct.pack("<IqQI", 1, int(ts[0]), int(vbits[0]), 1)
    raw_deltas = np.diff(ts)
    unit = int(np.gcd.reduce(np.abs(raw_deltas))) or 1
    head = struct.pack("<IqQI", n, int(ts[0]), int(vbits[0]), unit)
    w = _BitWriter()
    # timestamps: dod over unit-scaled deltas
    deltas = raw_deltas // unit
    dods = np.diff(deltas, prepend=deltas[:1] - deltas[0])
    dods[0] = deltas[0]  # first entry stores the first delta itself
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
            continue
        z = _zigzag(dod)
        for bits, prefix, plen in _DOD_BUCKETS:
            if z < (1 << bits):
                w.write(prefix, plen)
                w.write(z, bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(z & ((1 << 64) - 1), 64)
    # values: xor chain
    prev_lead, prev_len = -1, 0
    xors = vbits[1:] ^ vbits[:-1]
    for x in xors.tolist():
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - int(x).bit_length()
        trail = (int(x) & -int(x)).bit_length() - 1
        lead = min(lead, 31)
        if prev_lead >= 0 and lead >= prev_lead and trail >= 64 - prev_lead - prev_len:
            w.write(0b10, 2)
            w.write(int(x) >> (64 - prev_lead - prev_len), prev_len)
        else:
            mlen = 64 - lead - trail
            w.write(0b11, 2)
            w.write(lead, 5)
            w.write(mlen - 1, 6)  # mlen in [1,64] stored as 0..63
            w.write(int(x) >> trail, mlen)
            prev_lead, prev_len = lead, mlen
    return head + w.getvalue()


def gorilla_decode(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of gorilla_encode: blob -> (ts int64, vals float64)."""
    (n,) = struct.unpack_from("<I", blob, 0)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    t0, v0, unit = struct.unpack_from("<qQI", blob, 4)
    ts = np.empty(n, np.int64)
    vb = np.empty(n, np.uint64)
    ts[0], vb[0] = t0, v0
    if n == 1:
        return ts, vb.view(np.float64)
    r = _BitReader(blob[24:])
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        else:
            for bits, _, plen in _DOD_BUCKETS:
                if r.read(1) == 0:
                    dod = _unzigzag(r.read(bits))
                    break
            else:
                dod = _unzigzag(r.read(64))
        delta += dod
        ts[i] = ts[i - 1] + delta * unit
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        if r.read(1) == 0:
            vb[i] = vb[i - 1]
            continue
        if r.read(1) == 0:
            x = r.read(prev_len) << (64 - prev_lead - prev_len)
        else:
            prev_lead = r.read(5)
            prev_len = r.read(6) + 1
            trail = 64 - prev_lead - prev_len
            x = r.read(prev_len) << trail
        vb[i] = vb[i - 1] ^ np.uint64(x)
    return ts, vb.view(np.float64)


SEGMENT_SCHEMA_SUFFIX = (
    "ts_base long, n_points int, blob binary, raw_bytes long, "
    "enc_bytes long, compression_ratio double"
)


def compress_segments(df: DataFrame, keys: Sequence[str] = ("source", "doc_id"),
                      ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """One Gorilla blob per key group (grouped Arrow-batch UDF).

    The input is shuffled once on ``keys``; inside each Arrow batch the
    series is sorted by (ts, value) — a deterministic total order so the
    blob is identical under any partitioning.
    """
    keys = list(keys)
    key_fields = ", ".join(
        f"{k} {t}" for k, t in zip(keys, _key_types(df, keys))
    )
    schema = f"{key_fields}, {SEGMENT_SCHEMA_SUFFIX}"

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ts_col, value_col], kind="mergesort")
        ts = (pdf[ts_col].astype("datetime64[ns]").astype("int64") // 10**9).to_numpy()
        vals = pdf[value_col].to_numpy(dtype=np.float64)
        blob = gorilla_encode(ts, vals)
        raw = 16 * len(ts)  # int64 ts + float64 value per point
        row = {k: pdf[k].iloc[0] for k in keys}
        row.update(
            ts_base=int(ts[0]) if len(ts) else 0,
            n_points=len(ts),
            blob=blob,
            raw_bytes=raw,
            enc_bytes=len(blob),
            compression_ratio=float(raw) / max(len(blob), 1),
        )
        return pd.DataFrame([row])

    return df.repartition(*keys).groupBy(*keys).applyInPandas(encode, schema)


def decompress_segments(seg: DataFrame, keys: Sequence[str] = ("source", "doc_id"),
                        ts_col: str = "ts", value_col: str = "value") -> DataFrame:
    """Explode blobs back to (keys..., ts, value) rows (iterator
    Arrow-batch UDF — a narrow map, no shuffle)."""
    keys = list(keys)
    key_fields = ", ".join(
        f"{k} {t}" for k, t in zip(keys, _key_types(seg, keys))
    )
    schema = f"{key_fields}, {ts_col}_epoch long, {value_col} double"

    def decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            frames = []
            for _, row in pdf.iterrows():
                ts, vals = gorilla_decode(row["blob"])
                out = pd.DataFrame({f"{ts_col}_epoch": ts, value_col: vals})
                for k in keys:
                    out[k] = row[k]
                frames.append(out[keys + [f"{ts_col}_epoch", value_col]])
            if frames:
                yield pd.concat(frames, ignore_index=True)

    out = seg.select(*keys, "blob").mapInPandas(decode, schema)
    return out.withColumn(ts_col, F.timestamp_seconds(F.col(f"{ts_col}_epoch")))


def _key_types(df: DataFrame, keys: Sequence[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[k] for k in keys]
