"""URL / domain operators (round 15, verdict item 3).

parse_url column semantics over adversarial shapes, byte-exact DuckDB
twin parity from the shared constants, filter_domains' list/DataFrame/
host-level/NULL postures, and cap_per_domain's determinism +
partitioning invariance.  The driver-certified surface is the
q_dedup_lines 'url' / 'url_cap' sections; their mutants live in
tests/test_oracle_sensitivity.py.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark.operators.urls import (
    cap_per_domain,
    filter_domains,
    parse_url,
    registered_domain_sql,
    url_parts_sql,
)

ROWS = [
    (0, "https://www.example.com/path/a?q=1"),
    (1, "http://sub.shop.co.uk:8080/x"),
    (2, "ftp://files.data.org/pub"),
    (3, "https://user:pw@auth.net/private"),
    (4, "http://[2001:db8::7]:8443/v6"),
    (5, "https://xn--bcher-kva.de/books"),
    (6, "example.com/no-scheme"),
    (7, "https://evil.bad.com/x"),
    (8, "http://localhost:3000/dev"),
    (9, "https://deep.sub.site.com.au/page"),
    (10, None),
    (11, "https://203.0.113.9/ipv4"),
    (12, "HTTPS://UPPER.EXample.COM/Q"),
    (13, "   "),
    (14, "http://[::1]/loop"),
    (15, "https://a.b?query-no-path"),
]


def _parsed(spark):
    return parse_url(
        spark.createDataFrame(ROWS, "doc_id long, url string")
    )


def test_parse_url_semantics(spark):
    got = {r.doc_id: r for r in _parsed(spark).collect()}
    exp = {
        0: ("https", "www.example.com", None, "/path/a", "example.com", "com"),
        1: ("http", "sub.shop.co.uk", 8080, "/x", "shop.co.uk", "uk"),
        2: ("ftp", "files.data.org", None, "/pub", "data.org", "org"),
        # userinfo skipped, never leaked into the host
        3: ("https", "auth.net", None, "/private", "auth.net", "net"),
        # bracketed IPv6: unbracketed host, itself as domain, no tld,
        # port still parses past the bracket
        4: ("http", "2001:db8::7", 8443, "/v6", "2001:db8::7", None),
        5: ("https", "xn--bcher-kva.de", None, "/books",
            "xn--bcher-kva.de", "de"),
        # scheme-less still parses a host (browser-default posture)
        6: (None, "example.com", None, "/no-scheme", "example.com", "com"),
        7: ("https", "evil.bad.com", None, "/x", "bad.com", "com"),
        8: ("http", "localhost", 3000, "/dev", "localhost", None),
        # two-level ccTLD suffix: registered domain is three labels
        9: ("https", "deep.sub.site.com.au", None, "/page",
            "site.com.au", "au"),
        10: (None, None, None, None, None, None),
        11: ("https", "203.0.113.9", None, "/ipv4", "203.0.113.9", None),
        # scheme and host lowercased, path case preserved
        12: ("https", "upper.example.com", None, "/Q", "example.com", "com"),
        13: (None, None, None, None, None, None),
        14: ("http", "::1", None, "/loop", "::1", None),
        # query without path: path is ''
        15: ("https", "a.b", None, "", "a.b", "b"),
    }
    for i, e in exp.items():
        r = got[i]
        assert (
            r.url_scheme, r.url_host, r.url_port, r.url_path,
            r.url_domain, r.url_tld,
        ) == e, (i, r)


def test_parse_url_matches_duckdb_twin(spark):
    """The SQL generators compile the SAME constants — scheme/host/port/
    path/registered-domain agree byte-for-byte over every fixture row."""
    got = (
        _parsed(spark)
        .select("doc_id", "url_scheme", "url_host", "url_port", "url_path",
                "url_domain")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(ROWS, columns=["doc_id", "url"]))
    p = url_parts_sql("url")
    dom = registered_domain_sql(f"({p['host']})")
    exp = con.execute(f"""
        SELECT doc_id, {p['scheme']} AS url_scheme, {p['host']} AS url_host,
               {p['port']} AS url_port, {p['path']} AS url_path,
               {dom} AS url_domain
        FROM t ORDER BY doc_id
    """).fetchdf()
    for c in ("url_scheme", "url_host", "url_path", "url_domain"):
        assert got[c].where(got[c].notna(), None).tolist() == \
            exp[c].where(exp[c].notna(), None).tolist(), c
    assert got["url_port"].astype("Int64").tolist() == \
        exp["url_port"].astype("Int64").tolist()


def test_parse_url_extra_suffixes_and_prefix(spark):
    df = spark.createDataFrame(
        [(0, "https://x.y.custom.suffix/p")], "doc_id long, url string"
    )
    r = parse_url(df, extra_suffixes=("custom.suffix",), prefix="u_").collect()[0]
    assert r.u_domain == "y.custom.suffix" and r.u_tld == "suffix"


def test_filter_domains_list_and_dataframe(spark):
    parsed = _parsed(spark)
    kept = {r.doc_id for r in filter_domains(parsed, ["bad.com"]).collect()}
    assert 7 not in kept
    # NULL-domain rows are KEPT (unparseable is not a block decision)
    assert {10, 13} <= kept
    bl = spark.createDataFrame([("bad.com",), ("DATA.ORG",)], "d string")
    kept2 = {r.doc_id for r in filter_domains(parsed, bl).collect()}
    assert 7 not in kept2 and 2 not in kept2 and {10, 13} <= kept2
    # host-level block: pins one subdomain without blocking the domain
    kept3 = {
        r.doc_id
        for r in filter_domains(parsed, ["www.example.com"]).collect()
    }
    assert 0 not in kept3 and 12 in kept3
    # empty list is a no-op
    assert filter_domains(parsed, []).count() == parsed.count()


def test_cap_per_domain_deterministic_and_invariant(spark):
    rows = [(i, f"d{i % 3}.com") for i in range(60)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "doc_id long, url_domain string")
    a = cap_per_domain(df, 5)
    got = {r.doc_id for r in a.collect()}
    # 3 domains x 5 + the 2 NULL-domain rows passing uncapped
    assert len(got) == 17 and {100, 101} <= got
    per = (
        a.where(F.col("url_domain").isNotNull())
        .groupBy("url_domain").count().collect()
    )
    assert all(r["count"] == 5 for r in per)
    # partitioning invariance + rerun determinism
    b = {r.doc_id for r in cap_per_domain(df.repartition(7), 5).collect()}
    assert b == got
    # different seed -> (almost surely) different representatives
    c = {r.doc_id for r in cap_per_domain(df, 5, seed=1).collect()}
    assert c != got
    with pytest.raises(ValueError):
        cap_per_domain(df, 0)


def test_cap_per_domain_plan_single_shuffle(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}.com") for i in range(30)],
        "doc_id long, url_domain string",
    )
    plan = cap_per_domain(df, 5)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_curate_corpus_url_gate(spark):
    """curate_corpus(url_col=, url_blocklist=, max_per_domain=) runs the
    C4 URL gate before everything else: blocklisted domains drop, hot
    domains cap, the diagnostic url_* columns never reach the output,
    the caller's url column survives as metadata."""
    from woe_monotonic_binning_spark.pipeline import curate_corpus

    rows = []
    for i in range(30):
        dom = "farm.com" if i < 20 else f"site{i}.org"
        rows.append((i, "src0", f"https://www.{dom}/p/{i}",
                     f"unique words document {i} " * 10))
    rows.append((90, "src0", "https://x.bad.com/e", "blocked text " * 10))
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, url string, text string"
    )
    out = curate_corpus(
        docs,
        near_dup=None,
        quality_threshold=0.0,
        weights=None,
        url_col="url",
        url_blocklist=["bad.com"],
        max_per_domain=5,
        cache_survivors=False,
    )
    got = out.collect()
    ids = {r.doc_id for r in got}
    assert 90 not in ids  # blocklisted
    farm = [r for r in got if "farm.com" in r.url]
    assert len(farm) == 5  # capped from 20
    assert len([r for r in got if "site" in r.url]) == 10
    assert "url" in out.columns and "__u_domain" not in out.columns


# -- round 16: data-driven PSL + host/port hardening -------------------------

from woe_monotonic_binning_spark.operators.urls import PublicSuffixList

_PSL_RULES = [
    "// test PSL", "com", "io", "github.io", "co.il", "uk", "co.uk",
    "*.ck", "!www.ck",
]


def test_parse_url_host_hardening(spark):
    """Trailing root dot trims before label arithmetic; hosts with empty
    labels and out-of-range ports honest-reject (round-16 advice)."""
    rows = [
        (0, "https://dot.example.org./t"),     # trailing root dot
        (1, "https://.lead.com/x"),            # leading empty label
        (2, "https://a..b.com/x"),             # inner empty label
        (7, "https://a.com../x"),              # multi-dot tail (r17 advice)
        (3, "http://h.example.com:70000/x"),   # int32-valid, >65535
        (4, "http://h.example.com:99999999999/x"),  # past int32
        (5, "http://h.example.com:0/x"),       # port 0 invalid
        (6, "http://h.example.com:65535/x"),   # max valid
    ]
    got = {
        r.doc_id: r
        for r in parse_url(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert (got[0].url_host, got[0].url_domain, got[0].url_tld) == (
        "dot.example.org", "example.org", "org"
    )
    for i in (1, 2, 7):
        assert got[i].url_host is None and got[i].url_domain is None, i
        assert got[i].url_path is None and got[i].url_scheme is None, i
        assert got[i].url_tld is None, i
    for i in (3, 4, 5):
        assert got[i].url_port is None, i
        assert got[i].url_host == "h.example.com", i  # host still parses
    assert got[6].url_port == 65535


def test_psl_longest_match_semantics(spark):
    """Exact / wildcard / exception rules, longest match, apex posture."""
    psl = PublicSuffixList(_PSL_RULES)
    rows = [
        (0, "https://a.github.io/p"),     # exact 2-label rule
        (1, "https://b.github.io/p"),     # sibling must NOT collapse
        (2, "https://github.io/apex"),    # host IS a public suffix
        (3, "https://shop.x.co.il/q"),    # rule absent from builtin set
        (4, "http://foo.bar.ck/w"),       # wildcard *.ck
        (5, "http://bar.ck/solo"),        # wildcard apex
        (6, "http://www.ck/e"),           # exception rule
        (7, "http://sub.www.ck/e2"),      # exception wins over wildcard
        (8, "https://plain.example.com/x"),  # default rule
    ]
    got = {
        r.doc_id: r.url_domain
        for r in parse_url(
            spark.createDataFrame(rows, "doc_id long, url string"),
            suffix_list=psl,
        ).collect()
    }
    assert got == {
        0: "a.github.io", 1: "b.github.io", 2: "github.io",
        3: "x.co.il", 4: "foo.bar.ck", 5: "bar.ck",
        6: "www.ck", 7: "www.ck", 8: "example.com",
    }


def test_psl_duckdb_twin_parity(spark):
    """The PSL SQL twin walks the SAME compile plan — registered domains
    agree byte-for-byte across rule kinds."""
    psl = PublicSuffixList(_PSL_RULES)
    rows = [
        (i, u) for i, u in enumerate([
            "https://a.github.io/p", "https://github.io/apex",
            "https://shop.x.co.il/q", "http://foo.bar.ck/w",
            "http://bar.ck/solo", "http://sub.www.ck/e",
            "https://dot.example.org./t", "https://203.0.113.9/ip",
            "http://[::1]/v6", "http://single/x", None,
        ])
    ]
    got = (
        parse_url(
            spark.createDataFrame(rows, "doc_id long, url string"),
            suffix_list=psl,
        )
        .select("doc_id", "url_domain")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "url"]))
    p = url_parts_sql("url")
    dom = registered_domain_sql(f"({p['host']})", suffix_list=psl)
    exp = con.execute(
        f"SELECT doc_id, {dom} AS url_domain FROM t ORDER BY doc_id"
    ).fetchdf()
    assert got["url_domain"].where(got["url_domain"].notna(), None).tolist() \
        == exp["url_domain"].where(exp["url_domain"].notna(), None).tolist()


def test_psl_from_file_and_dataframe(spark, tmp_path):
    """File / DataFrame / iterable constructions compile identically;
    PSL-format whitespace and comment handling follows the spec."""
    body = "\n".join(_PSL_RULES + ["", "  ", "co.uk  // inline junk"])
    path = tmp_path / "psl.dat"
    path.write_text(body, encoding="utf-8")
    a = PublicSuffixList.from_file(str(path))
    b = PublicSuffixList.from_dataframe(
        spark.createDataFrame([(r,) for r in _PSL_RULES], "rule string")
    )
    c = PublicSuffixList(_PSL_RULES)
    for psl in (a, b):
        assert psl.exact == c.exact
        assert psl.wildcard == c.wildcard
        assert psl.exception == c.exception
    # depth-1 exact rules compile away (they equal the default rule)
    assert "com" not in c.exact and "github.io" in c.exact
    assert len(c) == len(c.exact) + 2


def test_psl_full_scale_stays_map_side(spark):
    """A realistic-size rule table (9k rules incl. wildcards/exceptions)
    still compiles to ONE map-side projection: zero exchanges, zero
    joins — the corpus never shuffles against the PSL."""
    rules = [f"sub{i}.tld{i % 97}" for i in range(9000)]
    rules += [f"*.wild{i}" for i in range(50)] + [f"!exc{i}.wild{i}" for i in range(50)]
    psl = PublicSuffixList(rules)
    docs = spark.range(200).withColumn(
        "url",
        F.concat(F.lit("https://x.sub3.tld3/"), F.col("id").cast("string")),
    )
    out = parse_url(docs, suffix_list=psl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Join" not in plan, plan[:2000]
    row = out.where(F.col("id") == 7).collect()[0]
    assert row.url_domain == "x.sub3.tld3"


def test_parse_url_extra_suffixes_compose_with_psl(spark):
    psl = PublicSuffixList(["github.io"])
    df = spark.createDataFrame(
        [(0, "https://x.y.custom.suffix/p"), (1, "https://a.github.io/q")],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.url_domain
        for r in parse_url(
            df, extra_suffixes=("custom.suffix",), suffix_list=psl
        ).collect()
    }
    assert got == {0: "y.custom.suffix", 1: "a.github.io"}


def test_parse_url_filter_domains_stream_equals_batch(spark, tmp_path):
    """parse_url + filter_domains are stateless projections / broadcast
    anti-joins: the SAME calls on a Structured Streaming source produce
    byte-identical survivors and parsed columns (round-16 verdict item:
    streaming parity for the round-15 URL surface)."""
    psl = PublicSuffixList(_PSL_RULES)
    rows = [
        (i, u)
        for i, u in enumerate(
            [
                "https://a.github.io/p", "https://b.github.io/p",
                "http://evil.bad.com/x", "https://shop.x.co.il/q",
                "http://sub.www.ck/e", "https://dot.example.org./t",
                "http://h.example.com:70000/x", None, "   ",
                "https://deep.sub.site.com.au/page",
            ]
        )
    ]
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    spark.createDataFrame(rows, "doc_id long, url string").repartition(
        3
    ).write.parquet(src)

    def gate(df):
        return filter_domains(
            parse_url(df, suffix_list=psl), ["bad.com"]
        ).select(
            "doc_id", "url_scheme", "url_host", "url_port", "url_path",
            "url_domain", "url_tld",
        )

    stream = (
        spark.readStream.schema("doc_id bigint, url string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        gate(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda r: r.doc_id  # noqa: E731
    got = sorted(spark.read.parquet(out).collect(), key=key)
    exp = sorted(
        gate(spark.createDataFrame(rows, "doc_id long, url string"))
        .collect(),
        key=key,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    assert all(r.url_domain != "bad.com" for r in got)


def test_psl_unicode_rules_match_punycode_hosts(spark):
    """The real PSL writes IDN rules in unicode while crawl URLs carry
    punycode hosts: compiling both forms makes 'shop.中国' gate
    'x.shop.xn--fiqs8s' correctly (round 16)."""
    psl = PublicSuffixList(["com", "shop.中国"])
    assert "shop.xn--fiqs8s" in psl.exact and "shop.中国" in psl.exact
    df = spark.createDataFrame(
        [(0, "https://a.b.shop.xn--fiqs8s/p"), (1, "https://plain.com/x")],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.url_domain
        for r in parse_url(df, suffix_list=psl).collect()
    }
    assert got == {0: "b.shop.xn--fiqs8s", 1: "plain.com"}
