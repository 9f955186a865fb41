"""Trained quality classifier (round 15, verdict item 5).

Training: MLlib LogisticRegression over the certified Gopher signals,
labels from the deterministic gopher_filter rule (or a caller column).
Serving: the fitted weights compile to ONE sigmoid column expression —
stateless, so stream == batch is pinned here, and the DuckDB twin
(quality_prob_sql) is exact arithmetic from the same constants.  The
driver-certified surface is q_gopher_signals' quality_prob column under
the pinned _QUALITY_COEFFS; its coefficient mutant lives in
tests/test_oracle_sensitivity.py.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from woe_monotonic_binning_spark.quality import (
    QUALITY_SIGNAL_COLS,
    QualityClassifierModel,
    quality_prob_sql,
    train_quality_classifier,
)

SF = "/root/testdata/sf0.01"


def test_train_learns_the_gate(spark):
    """The synthetic-teacher fit must be a faithful soft surrogate of
    the hard rule: >= 95% thresholded agreement on the corpus it was
    fit on, with separated mean probabilities per class."""
    from woe_monotonic_binning_spark.operators.text import gopher_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    model = train_quality_classifier(docs)
    scored = model.score(docs).select("doc_id", "quality_prob")
    gate = gopher_filter(docs).select("doc_id", "keep")
    j = gate.join(scored, "doc_id")
    n = j.count()
    agree = j.where((F.col("quality_prob") > 0.5) == F.col("keep")).count()
    assert agree / n >= 0.95
    means = {
        r.keep: r.m
        for r in j.groupBy("keep").agg(F.avg("quality_prob").alias("m")).collect()
    }
    assert means[True] > 0.7 > 0.3 > means[False]


def test_train_with_explicit_labels(spark):
    """label_col= trains on caller labels instead of the rule: a label
    perfectly aligned with one signal yields a strong weight on it."""
    rows = [
        (i, ("word " * 200) if i % 2 else ("dup\ndup\ndup\nx " * 20), i % 2)
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lab int")
    model = train_quality_classifier(df, label_col="lab")
    scored = {
        r.doc_id: r.quality_prob for r in model.score(df).collect()
    }
    hi = sum(scored[i] for i in range(1, 40, 2)) / 20
    lo = sum(scored[i] for i in range(0, 40, 2)) / 20
    assert hi > lo + 0.5


def test_save_load_roundtrip(spark, tmp_path):
    m = QualityClassifierModel(
        {c: 0.1 * i for i, c in enumerate(QUALITY_SIGNAL_COLS)}, -1.5
    )
    p = str(tmp_path / "q.json")
    m.save(p)
    m2 = QualityClassifierModel.load(p)
    assert m2.coefficients == m.coefficients and m2.intercept == m.intercept


def test_score_assume_signals_matches_full_path(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(50)
    from woe_monotonic_binning_spark.operators.text import gopher_filter

    m = QualityClassifierModel(
        {c: (0.3 if "dup" in c else -0.2) for c in QUALITY_SIGNAL_COLS}, 0.1
    )
    full = {r.doc_id: r.quality_prob for r in m.score(docs).collect()}
    pre = {
        r.doc_id: r.quality_prob
        for r in m.score(gopher_filter(docs), assume_signals=True).collect()
    }
    assert full == pre


def test_quality_prob_sql_twin_matches_engine(spark):
    """quality_prob_sql generates DuckDB arithmetic from the same
    constants: byte-identical 6-dp probabilities over the engine's own
    signal rows."""
    from woe_monotonic_binning_spark.operators.text import gopher_filter

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    m = QualityClassifierModel(
        {c: (1.25 if "gram" in c else -0.5) for c in QUALITY_SIGNAL_COLS},
        -2.25,
    )
    sig = m.score(gopher_filter(docs), assume_signals=True)
    pdf = sig.select(
        "doc_id", *QUALITY_SIGNAL_COLS, "quality_prob"
    ).toPandas()
    con = duckdb.connect()
    con.register("t", pdf.drop(columns=["quality_prob"]))
    expr = quality_prob_sql(m.coefficients, m.intercept)
    exp = con.execute(
        f"SELECT doc_id, {expr} AS p FROM t ORDER BY doc_id"
    ).fetchdf()
    got = pdf.sort_values("doc_id")["quality_prob"].tolist()
    assert got == exp["p"].tolist()


def test_stream_equals_batch_scoring(spark, tmp_path):
    """The scoring projection is stateless: the SAME model.score call on
    a Structured Streaming source produces byte-identical probabilities
    to the batch run."""
    import os

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(120)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs.select("doc_id", "text").repartition(3).write.parquet(src)
    m = QualityClassifierModel(
        {c: (0.8 if "dup" in c else 0.05) for c in QUALITY_SIGNAL_COLS}, -1.0
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        m.score(stream)
        .select("doc_id", "quality_prob")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.doc_id: r.quality_prob for r in spark.read.parquet(out).collect()
    }
    exp = {
        r.doc_id: r.quality_prob
        for r in m.score(docs.select("doc_id", "text"))
        .select("doc_id", "quality_prob")
        .collect()
    }
    assert got == exp


def test_score_plan_is_pure_projection(spark):
    """Serving ships no MLlib, no Python, no shuffle: the scored plan has
    zero exchanges and zero Arrow/Python eval nodes."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
    m = QualityClassifierModel(
        {c: 0.1 for c in QUALITY_SIGNAL_COLS}, 0.0
    )
    plan = m.score(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    for marker in ("ArrowEvalPython", "BatchEvalPython", "FlatMapsInPandas"):
        assert marker not in plan, plan


def test_curate_corpus_quality_model_gate(spark):
    """curate_corpus(quality_model=) gates on the trained classifier:
    the quality column carries the model probability, low-probability
    docs drop at the caller's threshold, the intermediate signal columns
    never reach the survivors."""
    from woe_monotonic_binning_spark.pipeline import curate_corpus

    vocab = ("the quick brown fox jumps over a lazy dog while many other "
             "animals watch from nearby fields and wonder about dinner "
             "plans during long summer evenings full of light").split()

    def good(i):
        # non-repetitive prose: a unique token every third word keeps
        # every n-gram distinct (pure vocab rotation still repeats
        # bigrams with the rotation period and fails the Gopher rule)
        return " ".join(
            f"u{i}x{k}" if k % 3 == 0 else vocab[(i + k) % len(vocab)]
            for k in range(60)
        )

    junk = "spam spam spam\nspam spam spam\n" * 12
    docs = spark.createDataFrame(
        [
            (i, "src0", good(i) if i % 2 else junk + f" t{i}")
            for i in range(20)
        ],
        "doc_id long, source string, text string",
    )
    model = train_quality_classifier(docs)
    out = curate_corpus(
        docs,
        near_dup=None,
        quality_threshold=0.5,
        quality_model=model,
        weights=None,
        cache_survivors=False,
    )
    rows = out.collect()
    ids = {r.doc_id for r in rows}
    assert ids and all(i % 2 == 1 for i in ids), ids
    assert all(0.5 <= r.quality <= 1.0 for r in rows)
    assert "sig_dup_line_frac" not in out.columns


def test_train_tolerates_null_text_rows(spark):
    """Train/serve NULL parity (round-16 advice): a corpus containing
    NULL-text rows (NULL gopher signals) must not abort the training
    job — signals fill to 0.0 exactly as serving coalesces them, and
    NULL-label rows stay out of the fit."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    nulls = spark.createDataFrame(
        [(10_000 + i, None) for i in range(3)], "doc_id long, text string"
    )
    corpus = docs.select("doc_id", "text").unionByName(nulls)
    model = train_quality_classifier(corpus)  # must not raise
    scored = {
        r.doc_id: r.quality_prob
        for r in model.score(corpus).select("doc_id", "quality_prob")
        .where(F.col("doc_id") >= 10_000).collect()
    }
    # serving scores the NULL-text rows (all-zero signal vector)
    assert len(scored) == 3 and all(p is not None for p in scored.values())
