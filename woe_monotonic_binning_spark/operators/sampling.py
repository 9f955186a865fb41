"""Deterministic sampling and source mixing for training-data pipelines.

``DataFrame.sample`` is seed-AND-partitioning dependent: the same seed on a
repartitioned input selects different rows, so a pipeline re-run after a
layout change silently trains on different data.  These operators derive
the sampling decision from a *content hash of the row id* instead —
reproducible across partitionings, engines, and reruns, and cheap (one md5
per row, map-side, codegen'd, no shuffle, no state).

md5 (not xxhash64) on purpose: bit-identical in DuckDB, so every operator
here is oracle-checkable end to end.  The hash is uniform enough for
sampling; it is not a crypto or adversarial-robustness claim.

The same primitive gives dataset *mixing* — the per-source down-sampling
step of a pretraining data recipe ("20% of crawl, 100% of wiki, ..."):
one map-side filter, weights broadcast as a literal CASE, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_uniform(key: Column, seed: int = 0) -> Column:
    """Deterministic uniform [0, 1) draw per key: the first 8 hex digits of
    ``md5(key || '_' || seed)`` scaled by 2^-32.  Changing ``seed`` gives an
    independent draw — disjoint sample selections from the same corpus."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f"_{seed}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h / F.lit(4294967296.0)


def sample_by_hash(
    df: DataFrame, id_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash.

    Unlike ``df.sample`` the selection is a pure function of (id, seed):
    stable under repartitioning, resumable, and the complement
    (``hash >= fraction``) is exactly the held-out set — a deterministic
    train/validation split costs two filters over one scan."""
    return df.filter(hash_uniform(F.col(id_col), seed) < fraction)


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1, seed: int = 0
) -> tuple[DataFrame, DataFrame]:
    """(train, test) partition of the corpus by id hash — disjoint and
    exhaustive by construction, no shuffle, no persisted state."""
    u = hash_uniform(F.col(id_col), seed)
    return df.filter(u >= test_fraction), df.filter(u < test_fraction)


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Down-sample each source to its recipe weight (a pretraining data
    mixture): keep a row of source s iff hash_uniform(id) < weights[s].

    Sources absent from ``weights`` are dropped (weight 0).  The weight
    lookup compiles to a literal CASE chain — broadcast-free, map-side; at
    100 TB this is one codegen'd scan+filter whose output feeds the writer
    directly.  Weights > 1 are capped at 1 (hash sampling cannot
    up-sample; repeat epochs handle over-weighting downstream)."""
    u = hash_uniform(F.col(id_col), seed)
    frac = F.lit(0.0)
    for s, w in sorted(weights.items()):
        frac = F.when(F.col(source_col) == s, F.lit(min(float(w), 1.0))).otherwise(frac)
    return df.filter(u < frac)
