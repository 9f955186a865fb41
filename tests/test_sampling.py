"""Deterministic sampling / mixing properties (operators/sampling.py).

Value parity with DuckDB is carried by tests/test_oracle_local.py
(q_sample_hash, q_mix_sources); here: the properties that make these
operators safe in a pipeline — partitioning invariance, disjointness,
seed independence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_sample_invariant_to_partitioning(spark, docs):
    from woe_monotonic_binning_spark.operators.sampling import sample_by_hash

    base = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.3, seed=1).collect()}
    assert base
    for n in (1, 16):
        again = {
            r.doc_id
            for r in sample_by_hash(docs.repartition(n), "doc_id", 0.3, seed=1).collect()
        }
        assert again == base


def test_split_disjoint_exhaustive(spark, docs):
    from woe_monotonic_binning_spark.operators.sampling import train_test_split

    train, test = train_test_split(docs, "doc_id", test_fraction=0.2, seed=3)
    n_train, n_test, n = train.count(), test.count(), docs.count()
    assert n_train + n_test == n
    assert train.join(test, "doc_id").count() == 0
    # ~20% +- generous slack at n=500
    assert 0.1 < n_test / n < 0.3


def test_seeds_give_independent_samples(spark, docs):
    from woe_monotonic_binning_spark.operators.sampling import sample_by_hash

    a = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.5, seed=0).collect()}
    b = {r.doc_id for r in sample_by_hash(docs, "doc_id", 0.5, seed=1).collect()}
    assert a != b
    # overlap of two independent 50% draws ~ 25% of corpus, loosely bounded
    n = docs.count()
    assert 0.1 < len(a & b) / n < 0.4


def test_mix_drops_unlisted_sources_and_respects_weights(spark, docs):
    from woe_monotonic_binning_spark.operators.sampling import mix_sources

    out = mix_sources(docs, {"src0": 1.0, "src1": 0.0})
    got = {r.source for r in out.select("source").distinct().collect()}
    assert got == {"src0"}
    # weight 1.0 keeps every src0 row
    assert out.count() == docs.filter(F.col("source") == "src0").count()
