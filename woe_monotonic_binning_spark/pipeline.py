"""One-call corpus curation: the composition every piece of this engine
exists to serve, as a single user-facing entry point.

``curate_corpus`` chains quality scoring -> quality gate -> exact dedup ->
near-dup pair generation -> connected-components keep-best -> source
mixing -> train/test split labeling, all from the individually-tested
operators (the hash-certified q_curation_pipeline catalog query is this
exact composition with the oracle-checkable pair generator).

Scale posture, stage by stage (the 100 TB read of the plan):
- scoring, quality gate, mixing and split labeling are map-side column
  expressions — they fuse into the scans around them, zero shuffle;
- exact dedup shuffles 32-byte digests, never text;
- near-dup defaults to MinHash-LSH (banded, bucket-capped — the linear
  at-scale path); ``near_dup='jaccard'`` swaps in the oracle-exact blocked
  all-pairs generator (quadratic per block — for validation runs);
- keep-best runs the checkpointed O(log n) component rounds over
  (long, long) state and one window over (component, id, order) triples;
- the optional write is ONE pass, ``partitionBy(split)`` — the single-pass
  ``split_column`` labeling exists precisely so this writer never
  re-evaluates the pipeline per split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .operators.dedup import (
    dedup_keep_best,
    exact_dedup_by_digest,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
)
from .operators.sampling import mix_sources, split_column
from .operators.text import quality_score


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.5,
    near_dup: str | None = "minhash",
    near_dup_threshold: float = 0.7,
    block_cols: list[str] | None = None,
    weights: dict[str, float] | None = None,
    source_col: str = "source",
    test_fraction: float = 0.1,
    seed: int = 0,
    split_seed: int = 1,
    token_budgets: dict[str, float] | None = None,
    budget_seed: int = 2,
    benchmark: DataFrame | None = None,
    decontam_n: int = 8,
    output_path: str | None = None,
) -> DataFrame:
    """Run the full curation pipeline; returns the labeled survivor table
    (input columns + ``quality`` + ``component`` + ``split``).

    ``near_dup``: ``'minhash'`` (default, at-scale), ``'jaccard'`` (exact
    blocked all-pairs over ``block_cols``), or ``None`` to skip near-dup
    entirely.  ``weights=None`` skips source mixing.  ``token_budgets``
    (optional) caps each named source's token mass AFTER mixing — the
    "fill the recipe to N tokens" step (``select_to_token_budget`` over a
    transient BPE-ish token count); unnamed sources pass through.
    ``benchmark`` (optional) is an eval-set DataFrame sharing
    ``text_col``/``id_col``: every doc sharing a word ``decontam_n``-gram
    with it is dropped FIRST (broadcast gram scan + anti-join) —
    contamination must go before dedup picks cluster representatives, or
    a kept representative can still leak eval text.  ``output_path`` also
    writes the result as parquet partitioned by ``split`` (one pass).

    ``seed`` drives the source-mixing draw, ``split_seed`` the train/test
    draw, ``budget_seed`` the budget admission order — all three MUST
    differ (the defaults do): reusing one seed makes two stages functions
    of the SAME uniform draw, so e.g. the test split would systematically
    over-sample whatever the mixing draw correlates with (every doc with u
    just below a low source weight is both kept AND labeled test).
    """
    if benchmark is not None:
        from .operators.dedup import decontaminate

        docs = decontaminate(docs, benchmark, text_col, id_col, n=decontam_n)
    scored = quality_score(docs, text_col).filter(
        F.col("quality") >= quality_threshold
    )
    reps = exact_dedup_by_digest(scored, text_col, id_col).select(id_col)
    uniq = scored.join(reps, id_col, "left_semi")
    if near_dup == "minhash":
        pairs = minhash_dedup_pairs(
            uniq, text_col, id_col, threshold=near_dup_threshold
        )
        best = dedup_keep_best(uniq, pairs, id_col, "quality", descending=True)
    elif near_dup == "jaccard":
        pairs = ngram_jaccard_pairs(
            uniq, text_col, id_col, block_cols or [], near_dup_threshold
        )
        best = dedup_keep_best(uniq, pairs, id_col, "quality", descending=True)
    elif near_dup is None:
        best = uniq.withColumn("component", F.col(id_col).cast("long"))
    else:
        raise ValueError(f"near_dup must be 'minhash', 'jaccard' or None, got {near_dup!r}")
    mixed = mix_sources(best, weights, source_col, id_col, seed) if weights else best
    if token_budgets:
        from .operators.sampling import select_to_token_budget
        from .operators.text import token_count_bpe

        mixed = select_to_token_budget(
            mixed.withColumn("__toks", token_count_bpe(F.col(text_col))),
            token_budgets,
            token_col="__toks",
            id_col=id_col,
            group_col=source_col,
            seed=budget_seed,
        ).drop("__toks")
    labeled = split_column(mixed, id_col, test_fraction, split_seed, col="split")
    if output_path is not None:
        labeled.write.mode("overwrite").partitionBy("split").parquet(output_path)
    return labeled
