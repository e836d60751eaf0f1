"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct, processed by Arrow-batch iterator UDFs
(``mapInPandas``) so payload bytes never round-trip through per-row
Python. The actual codec libraries (PIL/ffmpeg/etc.) are NOT in this
container, so the pixel/sample decode step is stubbed: ``decode_meta``
extracts deterministic byte-level metadata (real and tested), while
``decode_pixels`` raises ``NotImplementedError`` with the schema and
batch shape the real implementation must keep.

Partitioning note for 100 TB: payload rows are large and self-contained
— a narrow ``mapInPandas`` pipeline (no shuffle), with
``spark.sql.files.maxPartitionBytes`` sized so one Arrow batch of
payloads fits executor memory. Metadata-only queries should select the
metadata struct and never touch the binary column (parquet column
pruning keeps payload I/O at zero).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, byte_len int, first_byte int, checksum bigint"


def attach_payload(df: DataFrame, text_col: str = "text",
                   payload_col: str = "payload") -> DataFrame:
    """Stand-in ingest: materialize an opaque binary payload column.

    (In production this is the raw image/audio bytes read from object
    storage; here it is the utf-8 bytes of a text column so tests and
    oracles are deterministic.)
    """
    return df.withColumn(payload_col, F.col(text_col).cast("binary"))


def decode_meta(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Arrow-batch metadata extraction over binary payloads.

    Deterministic byte-level features (length, first byte, additive
    checksum) — the plumbing (schema, batch iteration, binary transfer)
    is exactly what a real image/audio feature extractor needs.
    """

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            # one np.frombuffer view of the concatenated bytes + reduceat
            # per-payload — no per-row Python over payload contents
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64,
                               count=len(payloads))
            blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.cumsum(lens) - lens
            nz = lens > 0
            checksum = np.zeros(len(lens), dtype=np.int64)
            first = np.full(len(lens), -1, dtype=np.int32)
            if nz.any():
                csum = np.concatenate(([0], np.cumsum(blob, dtype=np.int64)))
                ends = starts + lens
                checksum[nz] = csum[ends[nz]] - csum[starts[nz]]
                first[nz] = blob[starts[nz]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "byte_len": lens.astype("int32"),
                    "first_byte": first,
                    "checksum": checksum,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, META_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_len int, frame_sum bigint"


def sample_frames(df: DataFrame, id_col: str = "doc_id",
                  payload_col: str = "payload", frame_bytes: int = 16,
                  stride: int = 4) -> DataFrame:
    """Frame sampling over binary payloads: split each payload into
    fixed-size frames and keep every ``stride``-th one (the video
    keyframe-sampling shape: decode only the frames you train on).

    Emits one row per SAMPLED frame with integer byte-sum features —
    the 1->n UDTF plumbing (schema, batch fan-out, partial last frame)
    a real frame extractor needs, fully vectorized: one concatenated
    uint8 view + prefix sums, frame boundaries built with
    repeat/arange arithmetic, zero per-byte Python.
    """

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            ids = pdf[id_col].to_numpy().astype(np.int64)
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64,
                               count=len(payloads))
            blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            csum = np.concatenate(([0], np.cumsum(blob, dtype=np.int64)))
            doc_starts = np.cumsum(lens) - lens
            nframes = -(-lens // frame_bytes)          # ceil
            n_samp = -(-nframes // stride)              # sampled per doc
            total = int(n_samp.sum())
            if total == 0:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                    "frame_idx": pd.Series([], dtype="int32"),
                                    "frame_len": pd.Series([], dtype="int32"),
                                    "frame_sum": pd.Series([], dtype="int64")})
                continue
            offs = np.cumsum(n_samp) - n_samp
            doc_rep = np.repeat(np.arange(len(ids)), n_samp)
            frame_idx = (np.arange(total) - offs[doc_rep]) * stride
            fstart = frame_idx * frame_bytes
            flen = np.minimum(frame_bytes, lens[doc_rep] - fstart)
            abs_start = doc_starts[doc_rep] + fstart
            fsum = csum[abs_start + flen] - csum[abs_start]
            yield pd.DataFrame({
                "doc_id": ids[doc_rep],
                "frame_idx": frame_idx.astype(np.int32),
                "frame_len": flen.astype(np.int32),
                "frame_sum": fsum,
            })

    return df.select(id_col, payload_col).mapInPandas(extract, FRAME_SCHEMA)


def decode_pixels(df: DataFrame, payload_col: str = "payload",
                  target_size: tuple[int, int] = (224, 224)) -> DataFrame:
    """STUB: full image decode + resize to ``target_size``.

    The real implementation is a ``mapInPandas`` UDF with output schema
    ``doc_id bigint, pixels array<float>, height int, width int`` that
    decodes each payload (PIL/libjpeg), resizes, and emits CHW float32
    — one Arrow batch of decoded tensors per input batch. Not available
    in this container (no imaging libraries). ``decode_pixels_fake``
    below exercises the identical plumbing (batch shape, tiling,
    block-mean resize, output schema) with a deterministic byte-level
    fake that a SQL oracle can replay.
    """
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; use decode_meta for byte-level features or "
        "decode_pixels_fake for the oracle-checked plumbing twin"
    )


PIXEL_SCHEMA = "doc_id bigint, br int, bc int, px double"


def decode_pixels_fake(df: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload",
                       size: int = 16, block: int = 4) -> DataFrame:
    """Deterministic FAKE decode + resize with REAL plumbing: tile each
    payload's bytes cyclically into a ``size x size`` image, then
    "resize" by exact block-mean pooling to ``(size/block)^2`` output
    pixels — one row per output pixel (doc_id, br, bc, px).

    This is the decode -> resize -> feature pipeline shape a real image
    path needs (mapInPandas batch iteration, payload byte access,
    vectorized tensor reshape/pool, 1->n fan-out) with arithmetic a SQL
    oracle can replay byte-for-byte: block means are sums of <=
    block^2 * 255 integers divided by a power of two, so every output
    is exact in double and engine-independent. Swap the tiling for a
    libjpeg decode and the block-mean for a real resampler and the
    Spark side is unchanged. Empty payloads emit px = 0.0 rows (the
    failure-ledger convention: no raise inside the batch)."""
    out = size // block
    assert block * out == size, "block must divide size"

    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            ids = pdf[id_col].to_numpy().astype(np.int64)
            n = len(ids)
            if n == 0:
                yield pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                    "br": pd.Series([], dtype="int32"),
                                    "bc": pd.Series([], dtype="int32"),
                                    "px": pd.Series([], dtype="float64")})
                continue
            lens = np.fromiter((len(b) for b in payloads), dtype=np.int64,
                               count=n)
            blob = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            starts = np.cumsum(lens) - lens
            safe = np.maximum(lens, 1)
            idx = np.arange(size * size, dtype=np.int64)
            # clamp so a zero-length payload (masked below) cannot index
            # past the blob when it is the last row of the batch
            gather = np.minimum(
                starts[:, None] + (idx[None, :] % safe[:, None]),
                max(len(blob) - 1, 0),
            )
            tiled = blob[gather] if len(blob) else np.zeros(
                (n, size * size), dtype=np.uint8
            )
            img = tiled.reshape(n, size, size).astype(np.float64)
            img[lens == 0] = 0.0
            pooled = img.reshape(n, out, block, out, block).mean(axis=(2, 4))
            rr, cc = np.meshgrid(np.arange(out), np.arange(out),
                                 indexing="ij")
            yield pd.DataFrame({
                "doc_id": np.repeat(ids, out * out),
                "br": np.tile(rr.ravel(), n).astype(np.int32),
                "bc": np.tile(cc.ravel(), n).astype(np.int32),
                "px": pooled.reshape(n, -1).ravel(),
            })

    return df.select(id_col, payload_col).mapInPandas(extract, PIXEL_SCHEMA)
