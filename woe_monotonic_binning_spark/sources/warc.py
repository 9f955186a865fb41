"""WARC (Web ARChive, ISO 28500) source — the CommonCrawl wire format
(round 16).

A web-scale corpus starts as WARC files: per crawl fetch one record
whose headers carry the target URI and whose block is the raw HTTP
response (status line + headers + body).  This module reads them
Spark-first, completing the crawl front-chain entirely in-engine::

    read_warc(...)                       # records: uri + HTTP headers + bytes
      -> decode_text(hint_col="http_content_type")   # charset from the header
      -> extract_html_text(...)          # markup -> text
      -> parse_url(...)                  # registered-domain gates

- :func:`read_warc` — ``binaryFile`` scan (one task per WARC file; like
  tar shards, the format ships as many ~1 GB files, so file count IS
  the parallelism) + a pure-stdlib record walk in Arrow-batched
  ``mapInPandas``.  Handles plain and gzip WARCs — including the
  member-per-record gzip framing CommonCrawl uses (stdlib ``gzip``
  reads concatenated members).  Works unchanged as a Structured
  Streaming source.
- :func:`explode_warc_column` — the same record walk over an in-plan
  BINARY COLUMN (one blob per row): the certification surface (the
  oracle can predict records of a JVM-built blob) and the escape hatch
  for WARCs arriving through another transport (Kafka values, tar
  members).
- ``http_payload=True`` (default) splits response records' HTTP
  envelope: the body bytes surface in ``content``, the declared
  ``Content-Type`` in ``http_content_type`` (feed it straight to
  ``decode_text(hint_col=)``), the status code in ``http_status``.
  Non-response records (request/metadata/warcinfo) pass their block
  through untouched with NULL http columns.
- **HTTP body decoding** (round 17): real CommonCrawl responses arrive
  chunked and/or compressed; ``content`` carries the DECODED bytes —
  ``Transfer-Encoding: chunked`` framing is removed first (RFC 9112
  §7.1: hex size lines, chunk extensions ignored, trailers tolerated),
  then ``Content-Encoding`` layers are undone in reverse declaration
  order (``gzip``/``x-gzip`` via stdlib gzip, ``deflate`` as zlib with
  the raw-stream fallback the dual RFC 9110 wild usage requires,
  ``identity`` a no-op).  The ORIGINAL declared values stay visible in
  ``http_transfer_encoding`` / ``http_content_encoding`` (lowercased).
  A body whose declared framing cannot be decoded — malformed chunk
  sizes, truncated chunks, corrupt gzip, or an encoding stdlib cannot
  undo (``br``, ``zstd``) — is the honest-reject row: ``content`` and
  ``n_bytes`` NULL with the encoding columns saying why.  Feeding
  compressed bytes to ``decode_text`` would produce silent mojibake;
  NULL never lies.

Malformed WARC framing (a record whose Content-Length overruns the
blob, a missing version line) raises — like the tar reader, a broken
ARCHIVE is a data-integrity incident, while tolerance for one crawl's
PAYLOAD (including its HTTP body framing, above) is per-record.
Reference: ISO 28500 / the WARC 1.1 spec at
iipc.github.io/warc-specifications and RFC 9110/9112 for the HTTP
envelope; the reference repo (a WOE binning library) has no file I/O
at all.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "WARC_RECORD_SCHEMA",
    "read_warc",
    "explode_warc_column",
    "synthetic_warc_blobs",
]

WARC_RECORD_SCHEMA = (
    "shard string, record_idx int, warc_type string, target_uri string, "
    "http_status int, http_content_type string, "
    "http_transfer_encoding string, http_content_encoding string, "
    "content binary, n_bytes long"
)


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers


def _iter_warc_records(blob: bytes):
    """Yield (warc_headers: dict, block: bytes) per record.  Gzip blobs
    (single- or member-per-record) are decompressed first; framing
    errors raise ValueError naming the offset."""
    if blob[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(blob)) as gz:
            blob = gz.read()  # stdlib gzip consumes concatenated members
    i = 0
    n = len(blob)
    while i < n:
        # tolerate inter-record CRLF padding
        while i < n and blob[i : i + 2] == b"\r\n":
            i += 2
        if i >= n:
            break
        if not blob[i : i + 5] == b"WARC/":
            raise ValueError(f"WARC framing error: no version line at {i}")
        hdr_end = blob.index(b"\r\n\r\n", i)
        headers = _parse_headers(blob[i:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"WARC framing error: bad Content-Length at {i}"
            ) from None
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError(
                f"WARC framing error: record at {i} overruns the file"
            )
        yield headers, blob[body_start : body_start + length]
        i = body_start + length


def _split_http(block: bytes):
    """(status:int|None, headers:dict|None, body:bytes) of an HTTP
    response block; a block without an HTTP status line passes through
    whole (an honest non-HTTP record, not an error)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return None, None, block
    head = block[:sep]
    status_line = head.split(b"\r\n", 1)[0].split()
    status = None
    if len(status_line) >= 2 and status_line[1].isdigit():
        status = int(status_line[1])
    return status, _parse_headers(head), block[sep + 4 :]


def _dechunk(body: bytes) -> bytes:
    """Remove RFC 9112 §7.1 chunked framing: hex size line (chunk
    extensions after ';' ignored), that many bytes, CRLF; the 0-size
    chunk ends the stream (trailer fields tolerated).  Raises ValueError
    on malformed framing — the caller turns that into the NULL-content
    honest reject."""
    out: list[bytes] = []
    i, n = 0, len(body)
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise ValueError("chunked: no size line")
        tok = body[i : j].split(b";", 1)[0].strip()
        if not tok:
            raise ValueError("chunked: empty size line")
        size = int(tok, 16)  # ValueError on junk propagates
        if size < 0:
            raise ValueError("chunked: negative size")
        i = j + 2
        if size == 0:
            return b"".join(out)  # trailers after this are tolerated
        if i + size + 2 > n:
            raise ValueError("chunked: chunk overruns body")
        if body[i + size : i + size + 2] != b"\r\n":
            raise ValueError("chunked: missing chunk CRLF")
        out.append(body[i : i + size])
        i += size + 2


def _inflate(body: bytes) -> bytes:
    """Content-Encoding: deflate — RFC 9110 says zlib-wrapped, the wild
    web ships raw streams too; try zlib first, fall back to raw."""
    try:
        return zlib.decompress(body)
    except zlib.error:
        return zlib.decompress(body, -zlib.MAX_WBITS)


def _decode_http_body(
    body: bytes, te: str | None, ce: str | None
) -> bytes | None:
    """Undo declared HTTP framing: dechunk, then Content-Encoding layers
    in reverse declaration order.  None = cannot produce honest bytes
    (malformed framing, corrupt stream, or an encoding stdlib cannot
    undo) — never pass compressed bytes downstream as if they were
    content."""
    try:
        if te is not None:
            # Transfer-Encoding other than (x-)chunked (e.g. 'gzip,
            # chunked' TE compression) is rare-to-nonexistent in crawls;
            # reject rather than guess half an encoding stack
            if te.replace("x-chunked", "chunked") != "chunked":
                return None
            body = _dechunk(body)
        if ce is not None:
            for layer in reversed([c.strip() for c in ce.split(",")]):
                if layer in ("gzip", "x-gzip"):
                    body = gzip.decompress(body)
                elif layer == "deflate":
                    body = _inflate(body)
                elif layer in ("identity", ""):
                    pass
                else:  # br, zstd, compress: not decodable with stdlib
                    return None
        return body
    except (ValueError, zlib.error, EOFError, OSError):
        return None  # malformed declared framing: honest reject


def _explode_kernel(http_payload: bool):
    def explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "shard": [], "record_idx": [], "warc_type": [],
                "target_uri": [], "http_status": [],
                "http_content_type": [], "http_transfer_encoding": [],
                "http_content_encoding": [], "content": [], "n_bytes": [],
            }
            for shard, blob in zip(pdf["shard"], pdf["content"]):
                if blob is None:
                    continue
                for idx, (hdrs, block) in enumerate(
                    _iter_warc_records(bytes(blob))
                ):
                    wtype = hdrs.get("warc-type")
                    status = ctype = te = ce = None
                    body: bytes | None = block
                    if http_payload and wtype == "response":
                        status, http_hdrs, body = _split_http(block)
                        if http_hdrs is not None:
                            ctype = http_hdrs.get("content-type")
                            te = http_hdrs.get("transfer-encoding")
                            ce = http_hdrs.get("content-encoding")
                            te = te.lower() if te is not None else None
                            ce = ce.lower() if ce is not None else None
                            if te is not None or ce is not None:
                                body = _decode_http_body(body, te, ce)
                    out["shard"].append(shard)
                    out["record_idx"].append(idx)
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(hdrs.get("warc-target-uri"))
                    out["http_status"].append(status)
                    out["http_content_type"].append(ctype)
                    out["http_transfer_encoding"].append(te)
                    out["http_content_encoding"].append(ce)
                    out["content"].append(body)
                    out["n_bytes"].append(
                        len(body) if body is not None else None
                    )
            yield pd.DataFrame(out)

    return explode


def read_warc(
    spark: SparkSession,
    path: str,
    pattern: str = "*.warc*",
    http_payload: bool = True,
    stream: bool = False,
) -> DataFrame:
    """One row per WARC record under ``path`` (module docstring has the
    schema, envelope handling, and the loud-on-broken-archive posture).
    ``stream=True`` returns the Structured Streaming equivalent."""
    if stream:
        reader = spark.readStream.format("binaryFile").schema(
            "path string, modificationTime timestamp, length long, "
            "content binary"
        )
    else:
        reader = spark.read.format("binaryFile")
    files = (
        reader.option("pathGlobFilter", pattern)
        .load(path)
        .select(F.col("path").alias("shard"), "content")
    )
    return files.mapInPandas(
        _explode_kernel(http_payload), schema=WARC_RECORD_SCHEMA
    )


def synthetic_warc_blobs(
    docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """One closed-form single-record WARC blob per row, built ENTIRELY
    JVM-side — the oracle-predictable fixture certifying the record
    walk + HTTP body decoding end to end (the q_dedup_lines 'warc'
    section; also the skew-smoke arm).  Body framing rotates on
    ``id % 4``: 0 plain, 1 ``Transfer-Encoding: chunked`` (two real
    hex-size chunks), 2 ``Content-Encoding: gzip`` — a VALID gzip
    member assembled in SQL from a stored-mode deflate block +
    ``F.crc32`` + ISIZE, so ``gzip.decompress`` verifies every byte —
    3 raw-stream deflate (the zlib-fallback path).  Every variant
    decodes back to the same closed-form ``'warc body <id> café'``
    bytes.  Returns ``(id_col, content binary)``."""

    def byte(c):  # one byte (binary) from an int column in 0..255
        return F.encode(F.char(c), "ISO-8859-1")

    def le16(c):  # little-endian uint16
        return F.concat(byte(c % 256), byte(F.floor(c / 256).cast("long")))

    did = F.col(id_col)
    uri = F.concat(
        F.lit("http://w"), F.pmod(did, F.lit(7)).cast("string"),
        F.lit(".example.org/p/"), did.cast("string"),
    )
    ctype = F.lit("text/plain; charset=UTF-8")
    variant = F.pmod(did, F.lit(4))
    body = F.encode(
        F.concat(F.lit("warc body "), did.cast("string"), F.lit(" café")),
        "UTF-8",
    )
    blen = F.octet_length(body)
    # raw DEFLATE of body as one stored (uncompressed) block:
    # BFINAL|BTYPE byte 0x01, LEN le16, NLEN = LEN ^ 0xFFFF le16, bytes
    deflate = F.concat(
        F.lit(b"\x01"), le16(blen), le16(65535 - blen), body
    )
    crc = F.crc32(body)
    gz = F.concat(
        F.lit(b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\x03"),
        deflate,
        byte(crc % 256),
        byte(F.floor(crc / 256).cast("long") % 256),
        byte(F.floor(crc / 65536).cast("long") % 256),
        byte(F.floor(crc / 16777216).cast("long") % 256),
        le16(blen), F.lit(b"\x00\x00"),  # ISIZE (blen < 65536)
    )
    # chunked framing: 'warc body ' (10 bytes, size line 'a') + the rest
    part2 = F.encode(
        F.concat(did.cast("string"), F.lit(" café")), "UTF-8"
    )
    chunked = F.concat(
        F.encode(F.lit("a\r\n"), "UTF-8"),
        F.encode(F.lit("warc body "), "UTF-8"),
        F.encode(F.lit("\r\n"), "UTF-8"),
        F.encode(
            F.concat(F.lower(F.hex(F.octet_length(part2))), F.lit("\r\n")),
            "UTF-8",
        ),
        part2,
        F.encode(F.lit("\r\n0\r\n\r\n"), "UTF-8"),
    )
    extra_hdr = (
        F.when(variant == 1, F.lit("Transfer-Encoding: chunked\r\n"))
        .when(variant == 2, F.lit("Content-Encoding: gzip\r\n"))
        .when(variant == 3, F.lit("Content-Encoding: deflate\r\n"))
        .otherwise(F.lit(""))
    )
    wire_body = (
        F.when(variant == 1, chunked)
        .when(variant == 2, gz)
        .when(variant == 3, deflate)
        .otherwise(body)
    )
    block = F.concat(
        F.encode(
            F.concat(F.lit("HTTP/1.1 200 OK\r\nContent-Type: "), ctype,
                     F.lit("\r\n"), extra_hdr, F.lit("\r\n")),
            "UTF-8",
        ),
        wire_body,
    )
    blob = F.concat(
        F.encode(
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: response\r\n"
                      "WARC-Target-URI: "), uri,
                F.lit("\r\nContent-Length: "),
                F.octet_length(block).cast("string"),
                F.lit("\r\n\r\n"),
            ),
            "UTF-8",
        ),
        block,
        F.encode(F.lit("\r\n\r\n"), "UTF-8"),
    )
    return docs.select(did.alias(id_col), blob.alias("content"))


def explode_warc_column(
    df: DataFrame,
    blob_col: str = "content",
    id_col: str = "doc_id",
    http_payload: bool = True,
) -> DataFrame:
    """The record walk over an in-plan binary column: one input row =
    one WARC blob -> one output row per record, with the caller's id in
    ``shard``.  Same kernel as :func:`read_warc` — certified through
    the q_dedup_lines 'warc' section, which :func:`read_warc` shares
    everything with except the binaryFile scan."""
    narrow = df.select(
        F.col(id_col).cast("string").alias("shard"),
        F.col(blob_col).alias("content"),
    )
    return narrow.mapInPandas(
        _explode_kernel(http_payload), schema=WARC_RECORD_SCHEMA
    )
