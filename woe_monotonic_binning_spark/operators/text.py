"""Text-analysis operators for large-scale training-data pipelines.

All hot paths are built-in column expressions (JVM, whole-stage codegen) —
no Python UDFs: at 100 TB these run as a single map-side pass over the
corpus, shuffling only the (tiny) aggregate outputs.

Where an operator needs a hash, we use functions with identical output in
DuckDB (md5) so the driver oracle can check values, or Spark-native
xxhash64 where the oracle is structural only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Marker stopwords per language for the rule-based language detector.
# Deliberately tiny and deterministic — the point is the Spark plumbing
# (vectorised regex count + argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}

_WORD_RE = "[A-Za-z0-9]+"
# BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
# non-alphanumeric non-space symbols (GPT-2-style coarse split).
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def word_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(_WORD_RE), F.lit(0)))


def token_count_bpe(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_RE), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, "[^A-Za-z0-9\\s]", ""))
    return n_punct / F.greatest(F.length(text), F.lit(1))


def space_ratio(text: Column) -> Column:
    n_space = F.length(text) - F.length(F.regexp_replace(text, "\\s", ""))
    return n_space / F.greatest(F.length(text), F.lit(1))


def stopword_count(text: Column, words: list[str]) -> Column:
    pattern = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def fingerprint(text: Column, length: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of the whitespace-normalised,
    lower-cased text.  md5 is bit-identical in DuckDB, so oracle-checkable."""
    normal = F.regexp_replace(F.trim(F.lower(text)), "\\s+", " ")
    return F.substring(F.md5(normal), 1, length)


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document feature columns (length, words, tokens, ratios)."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("stat_chars"),
        word_count(t).alias("stat_words"),
        token_count_bpe(t).alias("stat_tokens"),
        F.round(punct_ratio(t), 6).alias("stat_punct_ratio"),
        F.round(space_ratio(t), 6).alias("stat_space_ratio"),
        fingerprint(t).alias("stat_fingerprint"),
    )


def detect_language(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based language ID: per-language marker-word counts -> argmax.

    Ties break by language code order; zero matches -> 'und'.  Pure column
    expressions; the score computation is one regexp pass per language.
    """
    t = F.lower(F.col(text_col))
    scores = [stopword_count(t, ws).alias(f"score_{lang}") for lang, ws in LANG_MARKERS.items()]
    scored = df.select("*", *scores)
    langs = sorted(LANG_MARKERS)  # deterministic tiebreak order
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for l in langs:
        pred = pred.when(F.col(f"score_{l}") == best, F.lit(l))
    return scored.withColumn("lang_pred", pred)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0, 1]: length sweet-spot, low punct
    noise, healthy word spacing, stopword presence.  Weights are arbitrary
    but fixed; the operator exists to exercise a fused single-pass scoring
    expression at corpus scale."""
    t = F.col(text_col)
    words = word_count(t)
    len_score = F.least(words / F.lit(100.0), F.lit(1.0))
    punct_pen = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio(t) * 5.0)
    space_score = F.when(
        (space_ratio(t) > 0.05) & (space_ratio(t) < 0.3), 1.0
    ).otherwise(0.5)
    stop_score = F.least(
        stopword_count(F.lower(t), LANG_MARKERS["en"]) / F.greatest(words, F.lit(1)) * 10.0,
        F.lit(1.0),
    )
    score = 0.35 * len_score + 0.25 * punct_pen + 0.2 * space_score + 0.2 * stop_score
    return df.withColumn("quality", F.round(score, 6))
