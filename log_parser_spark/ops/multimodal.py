"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is gated behind an import guard: when PIL is present
(`_HAS_PIL`), ``decoder="auto"`` uses a REAL image decode
(PIL.Image.open -> size / resize); without it — as in this sandbox —
the deterministic sha256-based stub runs instead, so the Spark-side
plumbing — schema, batching, mapInPandas signature, partition
behavior — is always real and tested.  The driver queries pin
``decoder="stub"`` explicitly so their golden/oracle outputs stay
deterministic regardless of which libraries a cluster has; video
frame sampling stays stubbed (pyav gated the same way would go here).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # real image decode iff PIL is installed (not in this sandbox)
    from PIL import Image as _PILImage
    _HAS_PIL = True
except ImportError:
    _PILImage = None
    _HAS_PIL = False


def _resolve_decoder(decoder: str) -> bool:
    """True = real PIL decode, False = deterministic stub."""
    if decoder == "real" and not _HAS_PIL:
        raise NotImplementedError("decoder='real' needs PIL installed")
    return decoder == "real" or (decoder == "auto" and _HAS_PIL)

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_hash", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def _fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic stand-in for an image decode + feature extraction
    (sha256-derived dims and feature) — the CI-stable path the driver
    oracles pin against."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feature = [b / 255.0 for b in digest[:8]]
    return width, height, feature


def _real_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """PIL decode: true dims + an 8-value grayscale-mean feature from a
    4x2 thumbnail (a stand-in for a model forward)."""
    import io
    img = _PILImage.open(io.BytesIO(payload))
    w, h = img.size
    thumb = img.convert("L").resize((4, 2))
    feature = [p / 255.0 for p in thumb.tobytes()]
    return w, h, feature


def extract_media_metadata(df: DataFrame, key: str = "doc_id",
                           binary_col: str = "payload",
                           decoder: str = "stub") -> DataFrame:
    """binary column -> typed metadata rows via mapInPandas (Arrow
    batches of raw bytes; one output row per input row).

    decoder: "stub" (deterministic fake — the oracle-pinned default),
    "real" (PIL, raises without it), or "auto" (real iff PIL present).
    """
    use_real = _resolve_decoder(decoder)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_bytes": [], "content_hash": [],
                   "width": [], "height": [], "feature": []}
            for k, payload in zip(pdf[key].values, pdf[binary_col].values):
                data = bytes(payload) if payload is not None else b""
                w, h, feat = (_real_decode(data) if use_real
                              else _fake_decode(data))
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
                  key: str = "doc_id", binary_col: str = "payload",
                  decoder: str = "stub") -> DataFrame:
    """Image resize as a mapInPandas stage: one thumbnail row per input
    row.  With decoder="real"/"auto"+PIL the pixel work is a true
    grayscale resize; otherwise a deterministic fake thumbnail derives
    from the payload hash.  Either way the Spark plumbing — Arrow
    binary batches in AND out, fixed output schema, row cardinality —
    is identical."""
    use_real = _resolve_decoder(decoder)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        for pdf in batches:
            out = {"doc_id": [], "width": [], "height": [], "thumbnail": []}
            for k, payload in zip(pdf[key].values, pdf[binary_col].values):
                data = bytes(payload) if payload is not None else b""
                if use_real:
                    img = _PILImage.open(io.BytesIO(data)).convert("L")
                    thumb = img.resize((target_w, target_h)).tobytes()
                else:
                    digest = hashlib.sha256(data).digest()
                    thumb = (digest * ((target_w * target_h)
                                       // len(digest) + 1)
                             )[: target_w * target_h]
                out["doc_id"].append(k)
                out["width"].append(target_w)
                out["height"].append(target_h)
                out["thumbnail"].append(thumb)
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
