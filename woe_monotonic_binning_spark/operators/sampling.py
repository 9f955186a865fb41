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


def split_column(
    df: DataFrame,
    id_col: str,
    test_fraction: float = 0.1,
    seed: int = 0,
    col: str = "split",
) -> DataFrame:
    """The SAME draw as ``train_test_split`` rendered as a label column
    ('train' / 'test') instead of two filtered branches.

    ``train_test_split``'s two DataFrames each re-evaluate their upstream
    plan — fine for interactive use, but a pipeline that consumes BOTH
    splits (count both, or write both) pays the whole lineage twice.  The
    single-pass form feeds one scan into ``write.partitionBy(col)`` — the
    write-once shape a 100 TB curation job wants.  Membership is identical
    by construction (same ``hash_uniform`` predicate), pinned by test."""
    u = hash_uniform(F.col(id_col), seed)
    return df.withColumn(
        col, F.when(u < test_fraction, F.lit("test")).otherwise(F.lit("train"))
    )


def sample_exact_n(
    df: DataFrame,
    id_col: str,
    n: int,
    group_col: str | None = None,
    seed: int = 0,
    oversample: float = 3.0,
) -> DataFrame:
    """Exactly ``min(n, group size)`` rows per group (or globally), chosen
    deterministically: rank rows by their hash draw and keep the first
    ``n``.  The selection is a pure function of (ids, seed) — stable under
    repartitioning like everything in this module — and NESTED: re-running
    with a larger ``n`` extends the same draw order, so the n=100 sample is
    always a subset of the n=200 sample.

    Scale shape: grouped, the window shuffles one (group, id, draw) triple
    per row — fine.  UNGROUPED, a single global window would funnel the
    corpus through one reducer, so the global path pre-filters to the
    ~``oversample * n`` smallest draws via an un-grouped threshold (one
    narrow count + filter) before the window ranks the survivors; the
    window then sorts thousands of rows, not billions.  If the pre-filter
    undershoots (pathological hash clustering), it falls back to the full
    window rather than returning short — correctness over speed, with a
    ``UserWarning`` emitted instead of silently sampling fewer rows."""
    from pyspark.sql.window import Window

    u = hash_uniform(F.col(id_col), seed).alias("__u")
    if group_col is not None:
        w = Window.partitionBy(group_col).orderBy("__u", id_col)
        return (
            df.withColumn("__u", u)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= n)
            .drop("__u", "__rn")
        )
    total = df.count()
    if total == 0 or n >= total:
        return df
    cut = min(1.0, oversample * n / total)
    pre = df.withColumn("__u", u).filter(F.col("__u") < cut)
    if pre.count() < n:  # hash clustering worse than the oversample margin
        import warnings

        warnings.warn(
            f"sample_exact_n pre-filter undershot (n={n}, "
            f"oversample={oversample}): ranking the full corpus through "
            "the single-reducer global window — correct but slow at scale",
            stacklevel=2,
        )
        pre = df.withColumn("__u", u)
    w = Window.orderBy("__u", id_col)
    return (
        pre.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__u", "__rn")
    )


def filter_top_fraction(
    df: DataFrame,
    score_col: str,
    fraction: float,
    relative_error: float = 1e-4,
) -> DataFrame:
    """Keep the best ~``fraction`` of rows by ``score_col`` — the
    percentile-gate form of quality filtering ("top 30% by quality score"),
    where the cut point must come from the data, not a constant.

    The threshold is one distributed ``approxQuantile`` pass (Greenwald-
    Khanna sketch, driver receives a single double) and the filter is then
    map-side; nothing shuffles.  Ties at the threshold are kept, so the
    realised fraction can exceed the request on heavily-tied scores —
    that is the right bias for a KEEP gate."""
    if not 0.0 < fraction <= 1.0:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    thr = df.stat.approxQuantile(score_col, [1.0 - fraction], relative_error)[0]
    return df.filter(F.col(score_col) >= thr)


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


def temperature_weights(
    df: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
    token_col: str | None = None,
    target_tokens: float | None = None,
) -> dict[str, float]:
    """Multinomial temperature ("alpha") mixing — the GPT-3 / XLM-R
    recipe for balancing a multi-source corpus: source s gets mixture
    proportion ``p_s = n_s^alpha / sum(n^alpha)`` where ``n_s`` is its
    row count (or token mass when ``token_col`` is given).  ``alpha=1``
    is natural proportions, ``alpha=0`` uniform; the usual 0.3-0.7 range
    up-weights small high-quality sources without drowning the big ones.

    Returns mixture PROPORTIONS (sum to 1) by default — feed
    ``select_to_token_budget(budgets={s: T * p_s})``.  With
    ``target_tokens=T`` it returns per-source KEEP FRACTIONS
    ``min(1, T * p_s / n_s)`` — feed :func:`mix_sources` directly.
    Fractions cap at 1 (hash sampling cannot up-sample; under-filled
    sources are the documented alpha-sampling behavior — repeat epochs
    handle up-weighting downstream), so the realized mixture matches
    ``p`` exactly only while no source exhausts.

    One aggregation (rows = distinct sources, trivially collected);
    the returned dict compiles into mix_sources' literal CASE — the
    whole recipe stays one map-side scan+filter at 100 TB."""
    if alpha < 0:
        raise ValueError(f"alpha must be non-negative, got {alpha}")
    agg = (
        F.count("*") if token_col is None
        else F.sum(F.col(token_col).cast("double"))
    )
    rows = df.groupBy(source_col).agg(agg.cast("double").alias("n")).collect()
    # sorted source order everywhere: float summation order is part of
    # the result, and collect() order is not deterministic — without
    # the sort two runs could differ in z's last ulp (round 17, the
    # certification prerequisite)
    n = dict(sorted(
        (r[0], float(r[1])) for r in rows if r[0] is not None and r[1]
    ))
    if not n:
        return {}
    powered = {s: v ** alpha for s, v in n.items()}
    z = sum(powered.values())
    p = {s: v / z for s, v in powered.items()}
    if target_tokens is None:
        return p
    return {
        s: min(1.0, float(target_tokens) * p[s] / n[s]) for s in n
    }


def select_to_token_budget(
    df: DataFrame,
    budgets: dict[str, float],
    token_col: str = "stat_tokens",
    id_col: str = "doc_id",
    group_col: str = "source",
    seed: int = 0,
    n_buckets: int = 1024,
) -> DataFrame:
    """Fill each source's token budget deterministically — the "data
    recipe" step of assembling a pretraining mix ("100 B tokens of crawl,
    30 B of code, all of wiki"): admit documents of group g in hash-draw
    order until g's cumulative token mass reaches ``budgets[g]``.

    Semantics (exactly the naive per-group running-sum rule, pinned by
    test): order g's docs by (hash_uniform(id, seed), id); a doc is kept
    iff the token sum of all docs BEFORE it is still < budget — so the doc
    that crosses the budget line is the last one in.  The selection is a
    pure function of (ids, seed, budgets): partitioning-invariant,
    re-runnable, and NESTED — a larger budget strictly extends the smaller
    budget's selection, so recipe iterations reuse cached shards.  Groups
    absent from ``budgets`` pass through untouched (only named sources are
    capped) — including rows whose ``group_col`` is NULL, which no budget
    key can name (the pass-through predicate tests ``isNull`` explicitly:
    a bare ``~isin(...)`` is NULL, not true, for NULL groups under
    three-valued logic and would silently drop them — round-6 ADVICE).

    Scale shape: the naive rule is one window over each ENTIRE group — a
    single-reducer funnel per source at 100 TB.  Instead the draw is
    bucketed (``floor(u * n_buckets)``) and a per-(group, bucket) token
    sum — groups x n_buckets rows, a bounded driver materialization like
    fit.py's quantile prefix-sum — locates each group's cut bucket.
    Buckets before the cut admit wholesale (map-side filter, no shuffle);
    only the ~1/n_buckets slice holding the budget line pays a window, and
    the two branches are separate scan->filter passes precisely so the
    corpus-wide shuffle a single fine-partitioned window would cost never
    happens."""
    from pyspark.sql.window import Window

    u = hash_uniform(F.col(id_col), seed)
    base = df.withColumn("__u", u).withColumn(
        "__b", F.floor(F.col("__u") * n_buckets).cast("int")
    )
    sums = base.groupBy(group_col, "__b").agg(F.sum(token_col).alias("__t")).collect()
    per_group: dict = {}
    for r in sums:
        per_group.setdefault(r[group_col], []).append((r["__b"], float(r["__t"] or 0)))

    full_cond = F.col(group_col).isNull() | ~F.col(group_col).isin(
        list(budgets)
    )  # pass-through groups (NULL groups cannot be named by a budget key)
    partial: dict[str, tuple[int, float]] = {}
    for g, pairs in per_group.items():
        if g not in budgets:
            continue
        budget = float(budgets[g])
        cum = 0.0
        cut_bucket = None
        for b, t in sorted(pairs):
            if cum + t >= budget:
                cut_bucket = b
                break
            cum += t
        if cut_bucket is None:  # budget >= group total: everything fits
            full_cond = full_cond | (F.col(group_col) == g)
        else:
            full_cond = full_cond | (
                (F.col(group_col) == g) & (F.col("__b") < cut_bucket)
            )
            if budget - cum > 0:
                partial[g] = (cut_bucket, budget - cum)

    kept = base.filter(full_cond)
    if partial:
        cond = F.lit(False)
        offset = F.lit(0.0)
        for g, (cb, off) in sorted(partial.items()):
            m = (F.col(group_col) == g) & (F.col("__b") == cb)
            cond = cond | m
            offset = F.when(m, F.lit(off)).otherwise(offset)
        w = (
            Window.partitionBy(group_col)
            .orderBy("__u", id_col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        part = base.filter(cond).withColumn(
            "__prev", F.coalesce(F.sum(token_col).over(w), F.lit(0.0))
        )
        kept = kept.unionByName(part.filter(F.col("__prev") < offset).drop("__prev"))
    return kept.drop("__u", "__b")


def diversity_sample(
    df: DataFrame,
    n: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 16,
    per_cell: int | None = None,
    seed: int = 0,
    lloyd_iters: int = 1,
    centroids: list[list[float]] | None = None,
    keep_cell: bool = False,
    oversample: float = 3.0,
) -> DataFrame:
    """Cluster-balanced ("diversity") sampling over an embedding column:
    exactly ``min(n, corpus size)`` rows chosen so every embedding cluster
    is represented as evenly as possible — the selection step of
    cluster-balanced data curation, where a plain uniform sample would
    reproduce the corpus's topic imbalance (the dominant cluster floods
    the sample) instead of correcting it.

    Mechanics: deterministic centroids (``similarity.train_centroids`` —
    lowest-id seeds + Lloyd refinement; or pass ``centroids`` to reuse a
    trained codebook), single-cell assignment, per-cell hash-draw rank,
    then a global first-``n`` by ``(rank, draw, id)`` — round-robin across
    cells, so cells contribute ceil/floor-balanced counts and a cell
    smaller than its fair share is simply exhausted, its remainder going
    to the next-ranked rows elsewhere.  Like everything in this module the
    pick is a pure function of (ids, seed, centroids): partitioning-
    invariant and NESTED in ``n`` (the global order never depends on
    ``n``, so a larger sample strictly extends a smaller one).

    ``per_cell`` switches to cap semantics instead: at most ``per_cell``
    rows from every cell (``n`` ignored, may return fewer total) — the
    "no more than k near-identical examples" guard rather than the
    "exactly n diverse examples" draw.

    ``id_col`` must be UNIQUE (the standing precondition of every
    hash-draw operator in this module): the selection re-joins the corpus
    on ``id_col``, so a duplicated id would multiply its row in the output
    and break the exactly-``min(n, size)`` contract.

    Scale shape: assignment is one broadcast-codebook pass; the per-cell
    rank shuffles narrow (id, cell, draw) triples, never vectors; the
    global first-n window runs over the ~``oversample * n`` best-ranked
    candidates only (rank pre-filter).  If the pre-filter undershoots —
    only reachable when ``n`` approaches corpus size / ``oversample``, or
    under a degenerate single-cell assignment — the ENTIRE ranked corpus
    routes through the single-reducer global window instead of returning
    short: correctness over speed, and a ``UserWarning`` is emitted so a
    production job sees the scale cliff (raise ``oversample`` or ``n_cells``
    to restore the pre-filtered path).  The selected ids then re-join the
    corpus as a broadcast-size semi-join."""
    import math

    from pyspark.sql.window import Window

    from .similarity import assign_cells, train_centroids

    if centroids is None:
        centroids = train_centroids(
            df, n_cells=n_cells, vec_col=vec_col, id_col=id_col, lloyd_iters=lloyd_iters
        )
    assigned = assign_cells(df, centroids, vec_col=vec_col, id_col=id_col).select(
        id_col, "cell"
    )
    u = hash_uniform(F.col(id_col), seed).alias("__u")
    ranked = assigned.withColumn("__u", u).withColumn(
        "__r", F.row_number().over(Window.partitionBy("cell").orderBy("__u", id_col))
    )
    if per_cell is not None:
        sel = ranked.filter(F.col("__r") <= per_cell).select(id_col, "cell")
    else:
        r_cap = max(1, math.ceil(oversample * n / max(1, len(centroids))))
        cand = ranked.filter(F.col("__r") <= r_cap)
        # A row outside the rank pre-filter can only make the global
        # first-n if fewer than n candidates exist (every candidate set
        # >= n dominates all rank > r_cap rows in (rank, ...) order), so
        # candidate-count >= n proves the pre-filter exact.
        if cand.count() < n:
            import warnings

            warnings.warn(
                f"diversity_sample rank pre-filter undershot (n={n}, "
                f"cells={len(centroids)}, oversample={oversample}): the "
                "full corpus routes through the single-reducer global "
                "window — correct but slow at scale; raise oversample or "
                "n_cells, or lower n",
                stacklevel=2,
            )
            cand = ranked
        w = Window.orderBy("__r", "__u", id_col)
        sel = (
            cand.withColumn("__g", F.row_number().over(w))
            .filter(F.col("__g") <= n)
            .select(id_col, "cell")
        )
    out = df.join(sel, id_col, "inner")
    return out if keep_cell else out.drop("cell")
