"""Trained quality classifier over the Gopher signal columns (round 15,
verdict item 5) — the DCLM/FineWeb-style upgrade path from the heuristic
``quality_score``.

Architecture is deliberately asymmetric, the Spark-first split:

- **Training** (:func:`train_quality_classifier`) uses MLlib
  LogisticRegression over the driver-certified ``gopher_signals``
  columns.  Labels come from ``label_col`` when the caller has real
  ones (human ratings, LLM judgments); otherwise from the deterministic
  Rae-et-al. acceptance rule (``gopher_filter``'s ``keep``) so the fit
  is reproducible end to end — the model learns a SOFT, monotone
  surrogate of the hard gate, which is exactly how DCLM bootstraps its
  fastText classifier from rule-based seeds.
- **Serving** (:meth:`QualityClassifierModel.score`) does NOT ship
  MLlib: the fitted coefficients compile into a pure column expression
  ``sigmoid(w . signals + b)`` — whole-stage-codegen'd, zero Python,
  zero vector columns, stateless, so the SAME call scores a Structured
  Streaming micro-batch (stream == batch parity pinned in tests) and
  the DuckDB oracle can recompute it as plain SQL arithmetic (the
  q_gopher_signals ``quality_prob`` column, pinned coefficients).

The model artifact is a JSON dict of (feature -> coefficient) plus the
intercept — small, diffable, broadcast-free.  The reference repo (a WOE
binning library) has no quality surface; this is beyond-reference
pipeline scope.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "QUALITY_SIGNAL_COLS",
    "QualityClassifierModel",
    "train_quality_classifier",
    "quality_prob_sql",
]

# The certified gopher_signals columns plus the word count — the feature
# order is part of the model contract (save/load round-trips it).
QUALITY_SIGNAL_COLS: tuple[str, ...] = (
    "stat_words",
    "sig_symbol_word_ratio",
    "sig_mean_word_len",
    "sig_dup_line_frac",
    "sig_bullet_line_frac",
    "sig_dup_2gram_char_frac",
    "sig_dup_3gram_char_frac",
    "sig_dup_4gram_char_frac",
    "sig_ellipsis_line_frac",
    "sig_stopword_line_frac",
)


class QualityClassifierModel:
    """Fitted artifact: ``coefficients`` (feature name -> weight) and
    ``intercept``.  Construction from pinned constants is first-class —
    the certification section builds one from the import-time constants
    rather than a training run, so the scoring math is oracle-exact."""

    def __init__(self, coefficients: dict[str, float], intercept: float):
        self.coefficients = {k: float(v) for k, v in coefficients.items()}
        self.intercept = float(intercept)

    # -- serving ---------------------------------------------------------
    def margin(self) -> Column:
        m = F.lit(self.intercept)
        for col, w in self.coefficients.items():
            m = m + F.lit(w) * F.coalesce(
                F.col(col).cast("double"), F.lit(0.0)
            )
        return m

    def score(
        self,
        df: DataFrame,
        text_col: str = "text",
        out_col: str = "quality_prob",
        assume_signals: bool = False,
    ) -> DataFrame:
        """Add ``out_col`` = sigmoid(w . signals + b), computed as ONE
        map-side column expression.  ``assume_signals=True`` skips the
        ``gopher_signals`` pass when the input already carries the
        feature columns (e.g. inside a pipeline that computed them for
        the hard gate).  Stateless projection: identical on batch and
        Structured Streaming inputs."""
        if not assume_signals:
            from .operators.text import gopher_signals, word_count

            df = gopher_signals(df, text_col).withColumn(
                "stat_words",
                word_count(F.col(text_col)).cast("double"),
            )
        prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-self.margin()))
        return df.withColumn(out_col, F.round(prob, 6))

    # -- persistence -----------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(
                {
                    "version": 1,
                    "intercept": self.intercept,
                    "coefficients": self.coefficients,
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "QualityClassifierModel":
        with open(path) as f:
            d = json.load(f)
        return cls(d["coefficients"], d["intercept"])

    def __repr__(self):
        return (
            f"QualityClassifierModel(n_features={len(self.coefficients)}, "
            f"intercept={self.intercept:.4f})"
        )


def train_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    max_iter: int = 100,
    reg_param: float = 0.01,
) -> QualityClassifierModel:
    """Fit LogisticRegression over the Gopher signal columns.

    ``label_col=None`` labels each document by the deterministic
    ``gopher_filter`` acceptance rule (the published Rae et al. bands) —
    a reproducible synthetic teacher; pass a real label column to train
    on human/LLM judgments instead.  L2 ``reg_param`` keeps the
    surrogate's weights finite when the rule is perfectly separable in
    the signals (it is — the gate IS a function of them).

    At 100 TB you train on a sample (the signals pass is one map-side
    projection; LBFGS iterations each aggregate a gradient of width
    n_features — 10 doubles — so the shuffle is trivially small); the
    returned artifact serves everywhere as a codegen projection."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    from .operators.text import gopher_filter

    feats = gopher_filter(df, text_col)
    if label_col is None:
        feats = feats.withColumn("__label", F.col("keep").cast("double"))
    else:
        feats = feats.withColumn(
            "__label", F.col(label_col).cast("double")
        )
    feats = feats.withColumn(
        "stat_words", F.col("stat_words").cast("double")
    )
    # Train/serve NULL parity (round-16 advice): serving coalesces NULL
    # signals to 0.0 (margin()), so training must see the same rows the
    # same way — fill NULLs instead of letting VectorAssembler's default
    # handleInvalid='error' abort the job on a NULL-text corpus.  Rows
    # whose LABEL is NULL stay out (nothing to learn from them).
    feats = feats.fillna(0.0, subset=list(QUALITY_SIGNAL_COLS)).where(
        F.col("__label").isNotNull()
    )
    asm = VectorAssembler(
        inputCols=list(QUALITY_SIGNAL_COLS), outputCol="__features"
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(asm.transform(feats))
    coef = {
        c: float(w)
        for c, w in zip(QUALITY_SIGNAL_COLS, model.coefficients.toArray())
    }
    return QualityClassifierModel(coef, float(model.intercept))


def quality_prob_sql(
    coefficients: dict[str, float], intercept: float
) -> str:
    """DuckDB twin of :meth:`QualityClassifierModel.score` over columns
    of the same names: round(1/(1+exp(-(b + w.x))), 6) — generated from
    the SAME pinned constants the engine model is built from."""
    terms = " + ".join(
        f"({w!r}) * coalesce(CAST({c} AS DOUBLE), 0.0)"
        for c, w in coefficients.items()
    )
    return f"round(1.0 / (1.0 + exp(-(({intercept!r}) + {terms}))), 6)"
