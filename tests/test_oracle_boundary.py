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
        "events",
    ]:
        shutil.copy(f"{SRC}/{t}.parquet", root / f"{t}.parquet")

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
    planted = pd.DataFrame(
        {
            "doc_id": [nid + 1, nid + 2],
            "text": ["…ellipsis bounded text ends non-ascii…", ""],
            "lang": ["en", "en"],
            "source": ["src0", "src0"],
            "n_chars": [39, 0],
        }
    ).astype(docs.dtypes.to_dict())
    pd.concat([docs, planted], ignore_index=True).to_parquet(
        root / "documents.parquet", index=False
    )
    return str(root)


@pytest.mark.parametrize(
    "name", ["q_sim_search", "q_dedup_embedding", "q_multimodal_stats"]
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
