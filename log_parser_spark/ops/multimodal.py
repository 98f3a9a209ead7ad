"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this
environment): `decode_stub` produces deterministic fake features so the
Spark-side plumbing — schema, batching, mapInPandas signature, partition
behavior — is real and tested.  Swap `_fake_decode` for a real decoder
(PIL / torchaudio / pyav) on a cluster that has them.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decode + feature extraction.

    Real implementation would be: PIL.Image.open -> resize -> model
    forward.  Raise instead if strict behavior is wanted:
    ``raise NotImplementedError("image decode needs PIL")``.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, feature


def extract_media_metadata(df: DataFrame, key: str = "doc_id",
                           binary_col: str = "payload") -> DataFrame:
    """binary column -> typed metadata rows via mapInPandas (Arrow
    batches of raw bytes; one output row per input row)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "content_hash": [],
                   "width": [], "height": [], "feature": []}
            for k, payload in zip(pdf[key].values, pdf[binary_col].values):
                data = bytes(payload) if payload is not None else b""
                w, h, feat = _fake_decode(data)
                out["doc_id"].append(k)
                out["n_bytes"].append(len(data))
                out["content_hash"].append(hashlib.md5(data).hexdigest())
                out["width"].append(w)
                out["height"].append(h)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(
        fn, schema=MEDIA_META_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("thumbnail", T.BinaryType()),
])


def resize_images(df: DataFrame, target_w: int = 64, target_h: int = 64,
                  key: str = "doc_id",
                  binary_col: str = "payload") -> DataFrame:
    """Image resize as a mapInPandas stage: one thumbnail row per input
    row.  The pixel work is STUBBED (no PIL here) with a deterministic
    fake thumbnail derived from the payload hash; the Spark plumbing —
    Arrow binary batches in AND out, fixed output schema, row
    cardinality — is real."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "thumbnail": []}
            for k, payload in zip(pdf[key].values, pdf[binary_col].values):
                data = bytes(payload) if payload is not None else b""
                # real impl: PIL.Image.open(io.BytesIO(data))
                #            .resize((target_w, target_h)).tobytes()
                digest = hashlib.sha256(data).digest()
                fake = (digest * ((target_w * target_h) // len(digest) + 1)
                        )[: target_w * target_h]
                out["doc_id"].append(k)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["thumbnail"].append(fake)
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(fn, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("ts_sec", T.DoubleType()),
    T.StructField("frame", T.BinaryType()),
])


def sample_frames(df: DataFrame, every_n_sec: float = 1.0,
                  max_frames: int = 8, key: str = "doc_id",
                  binary_col: str = "payload") -> DataFrame:
    """Video frame sampling as a mapInPandas stage: one input row fans
    out to MULTIPLE frame rows (the 1->N batch shape a real decoder
    needs).  Decode is STUBBED: a deterministic fake duration and fake
    frame bytes come from the payload hash; swap for pyav on a cluster
    that has it."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "ts_sec": [], "frame": []}
            for k, payload in zip(pdf[key].values, pdf[binary_col].values):
                data = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(data).digest()
                # real impl: container = av.open(...); duration; seek
                duration_sec = 1 + digest[2] % 16
                n = min(max_frames, int(duration_sec / every_n_sec))
                for i in range(n):
                    out["doc_id"].append(k)
                    out["frame_idx"].append(i)
                    out["ts_sec"].append(i * every_n_sec)
                    out["frame"].append(
                        hashlib.sha256(digest + bytes([i])).digest())
            yield pd.DataFrame(out)

    return df.select(key, binary_col).mapInPandas(fn, schema=FRAMES_SCHEMA)


def binary_meta_columns(df: DataFrame, key: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Pure-codegen binary metadata over an opaque payload column
    (here the utf-8 bytes of `text_col`): byte length + content hash.
    This is the JVM-side fast path; `extract_media_metadata` is the
    pandas path for real decoders."""
    return df.select(
        key,
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(text_col).cast("binary")).alias("content_hash"))
