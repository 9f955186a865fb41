"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video ride as ``binary`` columns plus a metadata struct; the
decode/feature steps run as Arrow-batched ``mapInPandas`` so each Python
worker sees a columnar batch of payloads (the right shape for a real
decoder or GPU preprocessor).

The decode kernels themselves are STUBS — the container has no image/audio
libraries — but everything Spark-side (schema, batch iteration, partition
sizing, UDF signatures) is real and tested.  ``fake_decode_stats`` is the
deterministic stand-in: byte-length + first/last-byte features, so tests
can assert exact values through the whole pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<mime: string, width: int, height: int, duration_ms: int>"
)

DECODED_STATS_SCHEMA = (
    "media_id bigint, kind string, n_bytes int, checksum string, "
    "first_byte int, last_byte int"
)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a media table from the documents fixture: utf-8 payload bytes
    with synthesised metadata.  Stands in for a real (id, bytes) source."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.pmod(F.col("doc_id"), F.lit(640)).cast("int").alias("width"),
            F.pmod(F.col("doc_id"), F.lit(480)).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def fake_decode_stats(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Deterministic decode stand-in over ``mapInPandas``.

    Real decoders drop in by replacing the per-batch body; the iterator
    shape (many small pandas batches per partition) is exactly what a
    GPU/codec kernel wants.
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len),
                    "checksum": content.map(lambda b: hashlib.md5(bytes(b)).hexdigest()),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": content.map(lambda b: b[-1] if len(b) else -1),
                }
            )

    return media.mapInPandas(decode, schema=DECODED_STATS_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode — requires an imaging library not present here."""
    raise NotImplementedError(
        "image decoding requires Pillow/opencv; wire your decoder into the "
        "mapInPandas body of fake_decode_stats — the Spark plumbing is done"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling stub: emits (media_id, frame_idx, ts_ms) rows from the
    metadata duration — the explode/posexplode shape of a real sampler with
    the decode left out."""
    return media.select(
        "media_id",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    (F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0)
                ),
            )
        ).alias("frame_idx", "_s"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )


FEATURES_SCHEMA = "media_id bigint, feature array<double>"


def extract_features(media: DataFrame, dim: int = 16, batch_size: int = 256) -> DataFrame:
    """Deterministic feature extraction over ``mapInPandas``: an L2-normalised
    byte histogram folded to ``dim`` buckets.

    Stands in for a real embedding model (CLIP/wav2vec/...) with the exact
    production shape — columnar batches in, fixed-width ``array<double>``
    out — so the output composes directly with ``operators.similarity``
    (top-k / IVF) and ``operators.dedup.embedding_neardup_pairs``.
    """
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(float) if arr.size else np.zeros(dim)
                n = np.linalg.norm(hist)
                feats.append(list(hist / n) if n > 0 else list(hist))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return media.mapInPandas(embed, schema=FEATURES_SCHEMA)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing with the codec stubbed: metadata is rewritten to the
    target dimensions and payloads pass through untouched (a real resizer
    replaces the per-batch body; the batch iteration, schema and partition
    shape are what it would use).  Marked fake via ``meta.mime``."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pd.DataFrame(
                {
                    "mime": "application/x-fake-resized",
                    "width": width,
                    "height": height,
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"],
                    "meta": meta.to_dict("records"),
                }
            )

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)
