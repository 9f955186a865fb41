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

NULL payloads: binary columns are nullable and any real source has missing
payloads, so every kernel tolerates ``content`` (and ``meta``) NULLs —
emitting NULL/sentinel feature values for those rows instead of killing the
stage with a Python TypeError deep inside the worker (round-8 review).
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


def fake_decode_stats(media: DataFrame) -> DataFrame:
    """Deterministic decode stand-in over ``mapInPandas``.

    Real decoders drop in by replacing the per-batch body; the iterator
    shape (many small pandas batches per partition) is exactly what a
    GPU/codec kernel wants.  Batch sizing is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (the former
    ``batch_size`` parameter was dead code — round-8 review).

    NULL payloads yield ``n_bytes``/``checksum``/byte sentinels of NULL
    (pandas None) instead of a worker TypeError.
    """
    import hashlib

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(
                        lambda b: len(b) if b is not None else None
                    ),
                    "checksum": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                        if b is not None
                        else None
                    ),
                    "first_byte": content.map(
                        lambda b: (b[0] if len(b) else -1) if b is not None else None
                    ),
                    "last_byte": content.map(
                        lambda b: (b[-1] if len(b) else -1) if b is not None else None
                    ),
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
    the decode left out.

    One frame per started ``every_ms`` interval: ``ceil(duration / every)``
    frames, so a 2500 ms clip at 1000 ms sampling yields ts 0/1000/2000
    (the old ``floor - 1`` bound dropped the last partial interval's frame
    — round-8 review), and zero/NULL-duration media yields NO frames
    instead of a phantom frame at ts 0."""
    n_frames = F.ceil(F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    return (
        media.filter(F.coalesce(n_frames, F.lit(0)) > 0)
        .select(
            "media_id",
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias(
                "frame_idx", "_s"
            ),
        )
        .select(
            "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
        )
    )


FEATURES_SCHEMA = "media_id bigint, feature array<double>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic feature extraction over ``mapInPandas``: an L2-normalised
    byte histogram folded to ``dim`` buckets.

    Stands in for a real embedding model (CLIP/wav2vec/...) with the exact
    production shape — columnar batches in, fixed-width ``array<double>``
    out — so the output composes directly with ``operators.similarity``
    (top-k / IVF) and ``operators.dedup.embedding_neardup_pairs``.  NULL
    payloads yield a NULL feature vector."""
    import numpy as np

    def embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["content"]:
                if b is None:
                    feats.append(None)
                    continue
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
    shape are what it would use).  Marked fake via ``meta.mime``; a NULL
    input ``meta`` stays NULL."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                {
                    "mime": "application/x-fake-resized",
                    "width": width,
                    "height": height,
                    "duration_ms": m["duration_ms"],
                }
                if m is not None
                else None
                for m in pdf["meta"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"],
                    "meta": meta,
                }
            )

    return media.mapInPandas(resize, schema=MEDIA_SCHEMA)
