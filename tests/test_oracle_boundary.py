"""Boundary-fixture certification checks (round-9 review of the
certification surface).

The round-9 adversarial review of queries_catalog.py found three oracle
pairs that agreed on the shipped fixtures only because the fixtures never
exercise the boundary: zero-norm embeddings (engine: try_divide -> NULL;
old oracle: DuckDB NaN, which sorts ABOVE everything and passes >=
thresholds) and non-ASCII / empty document payloads (engine: raw UTF-8
bytes with a -1 empty sentinel; old oracle: ascii() code points).  This
suite PLANTS exactly those rows in a doctored sf directory and runs the
same catalog (query, oracle) compare the driver runs — so the fixed
oracles are certified on the data that distinguishes them from the broken
ones.
"""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

import queries_catalog as qc
from tests.oracle_harness import compare, duckdb_connection

SRC = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def boundary_sf(tmp_path_factory):
    """sf0.001 copy with planted boundary rows: a zero-norm embedding in
    the densest label block, a doc whose text starts/ends with multi-byte
    chars, and an empty-text doc."""
    root = tmp_path_factory.mktemp("sf_boundary")
    for t in [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ]:
        shutil.copy(f"{SRC}/{t}.parquet", root / f"{t}.parquet")

    # exact-gap session boundary (late round 9): two events exactly 30
    # minutes apart, isolated 10 days after all real traffic.  Spark's
    # session_window MERGES the pair into ONE session; the pre-fix oracle
    # convention (>= starts a new session) split it in two and agreed on
    # the shipped fixtures only because no exact-30-minute gap exists
    # there.
    ev = pd.read_parquet(f"{SRC}/events.parquet")
    t0 = ev["ts"].max() + pd.Timedelta(days=10)
    planted_ev = pd.DataFrame(
        {
            "event_id": [int(ev["event_id"].max()) + 1, int(ev["event_id"].max()) + 2],
            "ts": [t0, t0 + pd.Timedelta(minutes=30)],
            "user_id": [int(ev["user_id"].iloc[0])] * 2,
            "event_type": ["click", "click"],
            "value": [1.0, 2.0],
            "props": ['{"k": 0}', '{"k": 0}'],
        }
    ).astype(ev.dtypes.to_dict())
    pd.concat([ev, planted_ev], ignore_index=True).to_parquet(
        root / "events.parquet", index=False
    )

    emb = pd.read_parquet(f"{SRC}/embeddings.parquet")
    dim = len(emb["embedding"].iloc[0])
    label = int(emb["label"].mode().iloc[0])
    zero = pd.DataFrame(
        {
            "vec_id": [int(emb["vec_id"].max()) + 1],
            "embedding": [[0.0] * dim],
            "label": [label],
        }
    ).astype({"vec_id": "int64", "label": "int32"})
    pd.concat([emb, zero], ignore_index=True).to_parquet(
        root / "embeddings.parquet", index=False
    )

    docs = pd.read_parquet(f"{SRC}/documents.parquet")
    nid = int(docs["doc_id"].max())
    # round-13 plant: vertical tab (Java \s member, NOT RE2's) plus NBSP
    # (whitespace in NEITHER engine class) — the text that distinguishes
    # the explicit [ \t\n\x0B\f\r] class from the old \s shorthand
    vt_text = "alpha\x0bbeta gamma\xa0delta the and of to is!"
    planted = pd.DataFrame(
        {
            "doc_id": [nid + 1, nid + 2, nid + 3],
            "text": ["…ellipsis bounded text ends non-ascii…", "", vt_text],
            "lang": ["en", "en", "en"],
            "source": ["src0", "src0", "src0"],
            "n_chars": [39, 0, len(vt_text)],
        }
    ).astype(docs.dtypes.to_dict())
    pd.concat([docs, planted], ignore_index=True).to_parquet(
        root / "documents.parquet", index=False
    )
    return str(root)


@pytest.mark.parametrize(
    "name",
    ["q_sim_search", "q_dedup_embedding", "q_multimodal_stats", "q_events_user_suite"],
)
def test_boundary_fixture_oracle_parity(spark, boundary_sf, name):
    con = duckdb_connection(boundary_sf)
    try:
        problems = compare(
            qc.SPARK_QUERIES[name](spark, boundary_sf),
            con,
            qc.ORACLE_SQL[name],
            name,
        )
    finally:
        con.close()
    assert not problems, "\n".join(problems)


def test_exact_gap_pair_is_actually_exercised(spark, boundary_sf):
    """Guard against the session-boundary plant going vacuous: the two
    planted events exactly 30 minutes apart must land in ONE Spark
    session (the merge-at-equality edge), and the pre-fix oracle
    convention (>= starts a new session) must disagree on this data."""
    import duckdb
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.windows import session_agg

    ev = spark.read.parquet(f"{boundary_sf}/events.parquet")
    planted_user = ev.orderBy(F.col("event_id").desc()).first()["user_id"]
    top = (
        session_agg(ev.filter(F.col("user_id") == planted_user))
        .orderBy(F.col("session_start").desc())
        .first()
    )
    assert top["n_events"] == 2 and float(top["total_value"]) == 3.0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{boundary_sf}/events.parquet'"
    )
    old_rule = con.execute(
        """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           >= INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), s AS (
          SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT count(DISTINCT sid) FROM s WHERE user_id = ?
        """,
        [int(planted_user)],
    ).fetchone()[0]
    new_rule = con.execute(
        """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                           > INTERVAL 30 MINUTE
                      OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), s AS (
          SELECT user_id, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        )
        SELECT count(DISTINCT sid) FROM s WHERE user_id = ?
        """,
        [int(planted_user)],
    ).fetchone()[0]
    con.close()
    assert old_rule == new_rule + 1, (
        "the planted pair no longer distinguishes the two session-boundary "
        "conventions — the regression plant went vacuous"
    )


def test_zero_vector_is_actually_exercised(spark, boundary_sf):
    """Guard against this suite going vacuous: the planted zero vector
    must reach the cosine computations (same label block as real rows)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{boundary_sf}/embeddings.parquet")
    zero_norm = emb.withColumn(
        "nrm", F.expr("aggregate(embedding, 0.0D, (a, x) -> a + x * x)")
    ).filter(F.col("nrm") == 0.0)
    rows = zero_norm.collect()
    assert len(rows) == 1
    label = rows[0]["label"]
    assert emb.filter(F.col("label") == label).count() > 1


def test_session_oracle_handles_duplicate_timestamps(spark):
    """Round-11 sf1 sweep regression: with DUPLICATE (user_id, ts) rows
    (sf1 replication creates exact ts copies) the gaps-and-islands oracle
    must order its lag AND running sum by (ts, event_id) — a bare ORDER
    BY ts lets the new_session=1 row sort mid-tie and DuckDB splits one
    true session across two ids (engine session_window is tie-safe).
    Pins the fixed oracle against session_agg on a planted tie frame."""
    import duckdb

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from woe_monotonic_binning_spark.operators.windows import session_agg

    rows = []
    eid = 0
    for ts, k in (("2024-01-01 10:00:00", 4), ("2024-01-01 12:00:00", 3)):
        for _ in range(k):
            rows.append((eid, 7, ts, 1.0, "click"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = sorted(
        (str(r.session_start), r.n_events)
        for r in session_agg(ev).collect()
    )
    assert got == [("2024-01-01 10:00:00", 4), ("2024-01-01 12:00:00", 3)]

    # the certified oracle (with the round-11 tiebreaker) must agree on
    # the same frame — extract just its session CTE chain
    sql = entry.oracle_sql()["q_events_user_suite"]
    assert "ORDER BY ts, event_id" in sql, "tiebreaker regressed out of the oracle"
    con = duckdb.connect()
    pdf = ev.toPandas()
    con.register("events", pdf)
    oracle = con.execute(
        sql.replace("UNION ALL", "UNION ALL -- cut").split("UNION ALL -- cut")[0]
        .replace("SELECT 'session' AS kind,", "SELECT")
    ).fetchdf()
    con.close()
    want = sorted((w, int(n)) for w, n in zip(oracle["wlabel"], oracle["n_events"]))
    assert want == got


# Round-13 \s-shorthand migration: every slot whose engine regexes moved to
# the explicit [ \t\n\x0B\f\r] class, re-certified on a corpus that
# actually carries the distinguishing bytes (vertical tab + NBSP).
WS_MIGRATED_SLOTS = [
    "q_text_stats",
    "q_quality_score",
    "q_tfidf",
    "q_dedup_lines",
    "q_doc_signals_suite",
    "q_dedup_ngram",
    "q_gopher_signals",
    "q_corpus_profile",
]


@pytest.mark.parametrize("name", WS_MIGRATED_SLOTS)
def test_ws_class_oracle_parity_on_vt_corpus(spark, boundary_sf, name):
    """The migrated slots must agree engine-vs-oracle on a corpus carrying
    \\x0B and NBSP — the exact data on which the old \\s shorthand
    diverged between Java (VT is whitespace) and RE2 (it is not)."""
    con = duckdb_connection(boundary_sf)
    try:
        problems = compare(
            qc.SPARK_QUERIES[name](spark, boundary_sf),
            con,
            qc.ORACLE_SQL[name],
            name,
        )
    finally:
        con.close()
    assert not problems, "\n".join(problems)


def test_vt_plant_is_actually_exercised(boundary_sf):
    """Non-vacuity guard: the planted doc really carries VT + NBSP, and on
    its text DuckDB's \\s shorthand disagrees with the explicit class —
    i.e. the plant genuinely distinguishes the migrated regexes from the
    old ones (if RE2's \\s ever grows \\x0B this fails and the plant
    needs a new distinguishing byte)."""
    import duckdb

    docs = pd.read_parquet(f"{boundary_sf}/documents.parquet")
    vt = docs[docs["text"].str.contains("\x0b", na=False)]
    assert len(vt) == 1
    text = vt["text"].iloc[0]
    assert "\xa0" in text
    con = duckdb.connect()
    shorthand, explicit = con.execute(
        "SELECT length(regexp_replace(?, '\\s', '', 'g')),"
        "       length(regexp_replace(?, '[ \\t\\n\\x0b\\f\\r]', '', 'g'))",
        [text, text],
    ).fetchone()
    con.close()
    # RE2 \s keeps the VT (longer remainder); the explicit class strips it
    assert shorthand == explicit + 1
    # NBSP is whitespace in NEITHER class: both remainders still carry it
    assert "\xa0" in text  # (kept above; the compare slots assert parity)
