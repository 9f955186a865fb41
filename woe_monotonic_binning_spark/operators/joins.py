"""Join operators Spark lacks as builtins: as-of join, range join, star join.

The reference has no joins at all (SURVEY.md section 2 preamble — its closest
analog is ``pd.cut``, the range-bucketize of binning.py:296-303); these are
the joins a large-scale training-data / feature pipeline needs around the
binning core.

Scale design:
- **as-of join** avoids the naive "join all earlier rows then pick max"
  (which explodes to |left| x |matching right| intermediates).  Instead both
  sides are unioned and a single ``last(..., ignorenulls=True)`` window pass
  per key carries the most recent right-side payload forward — ONE shuffle
  on the key, linear intermediate size, no Python.  This is the standard
  distributed point-in-time-correctness pattern for feature stores.
- **range join** broadcasts the (small) band table; the fact side never
  shuffles.  Catalyst turns it into BroadcastNestedLoopJoin — fine when the
  band table is tens-to-thousands of rows.
- **star join** broadcasts every dimension; the fact scan is the only
  full-data pass, with dimension filters applied before the broadcast so
  pushdown happens on the small side.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row nearest in time within the
    same key (inclusive on equal timestamps, like pandas ``merge_asof`` and
    DuckDB ``ASOF JOIN``):

    - ``direction='backward'`` (default): the LATEST right row with
      ``right_ts <= left_ts`` — point-in-time feature lookup.
    - ``direction='forward'``: the EARLIEST right row with
      ``right_ts >= left_ts`` — next-event attribution (DuckDB spells it
      ``ASOF JOIN ... ON l.ts <= r.ts``).
    - ``direction='nearest'``: whichever of the two is closer in absolute
      time; ties prefer the backward match (pandas convention).

    Right-side payload columns come back NULL when no matching right row
    exists (left join semantics).  Ties on ``right_ts`` within a key are
    resolved by the last row in (key, ts) order — pre-aggregate the right
    side to one row per (key, ts) for fully deterministic output.

    Spark has no builtin; implemented as union + window carry (one shuffle
    per direction: backward carries forward over ascending time, forward
    carries backward over descending time — same partitioning, so Catalyst
    reuses the exchange; ``nearest`` runs both passes and picks per row).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be 'backward', 'forward' or 'nearest', got {direction!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    # __ts cast to timestamp INSIDE the struct: the left side's NULL
    # payload declares __ts:timestamp, and an epoch-typed right_ts (which
    # __t's cast below explicitly supports) would otherwise make the
    # union's struct types incompatible (round-8 review)
    payload = F.struct(
        F.col(right_ts).cast("timestamp").alias("__ts"),
        *[F.col(c) for c in right_cols],
    ).alias("__payload")

    l_side = left.select(
        *[F.col(k) for k in keys],
        F.col(left_ts).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(
            "struct<__ts:timestamp," + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in right_cols
            ) + ">"
        ).alias("__payload"),
    )
    # A right row with a NULL timestamp can never be a legitimate as-of
    # match in any direction — and unfiltered it sorts FIRST under
    # ascending __t (nulls first), so it could become the backward match
    # with a NULL __ts payload, which then poisons the 'nearest'
    # closeness comparison (NULL arithmetic) into silently picking the
    # forward arm regardless of distance (round-9 advice).
    r_side = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(right_ts).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_side.schema["__row"].dataType.simpleString()).alias("__row"),
        payload,
    )
    # right rows sort before left rows at equal __t => inclusive match in
    # BOTH directions (at equal __t the right row precedes the left row
    # whether time ascends or descends, because the side tiebreak is the
    # same); the backward pass carries the latest earlier payload forward
    # over ascending time, the forward pass carries the earliest later
    # payload backward over descending time.
    unioned = l_side.unionByName(r_side)

    def _carry(desc: bool):
        order = F.col("__t").desc() if desc else F.col("__t").asc()
        w = (
            Window.partitionBy(*keys)
            .orderBy(order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return F.last("__payload", ignorenulls=True).over(w)

    if direction == "backward":
        carried = unioned.withColumn("__match", _carry(desc=False))
    elif direction == "forward":
        carried = unioned.withColumn("__match", _carry(desc=True))
    else:  # nearest: both passes, pick the closer; ties -> backward
        b, f_ = _carry(desc=False), _carry(desc=True)
        carried = unioned.withColumn(
            "__match",
            F.when(b.isNull(), f_)
            .when(f_.isNull(), b)
            .when(
                F.unix_micros(F.col("__t")) - F.unix_micros(b["__ts"])
                <= F.unix_micros(f_["__ts"]) - F.unix_micros(F.col("__t")),
                b,
            )
            .otherwise(f_),
        )
    out_left = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    out_right = [
        F.col(f"__match.{c}").alias(c if c not in left.columns else f"{c}{suffix}")
        for c in right_cols
    ]
    return carried.filter(F.col("__side") == 1).select(*out_left, *out_right)


def range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Attach the band whose ``[lo, hi)`` interval contains ``value_col``.

    The band table is broadcast — the fact side neither shuffles nor sorts.
    Bands are assumed disjoint (inner join; a value matching no band drops).
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return facts.join(F.broadcast(bands), cond, "inner")


def star_join(
    fact: DataFrame,
    dims: dict[str, tuple[DataFrame, str]],
) -> DataFrame:
    """Enrich a fact table with several small dimensions in one pass.

    ``dims`` maps fact foreign-key column -> (dimension df, dimension key).
    Every dimension is broadcast explicitly: at 100 TB the fact table must
    never shuffle for dimensions that fit in executor memory.
    """
    out = fact
    for fk, (dim, dk) in dims.items():
        # drop the dim-side key after the equi-join: it is redundant with
        # the fact FK and, when the names collide, every later by-name
        # reference to the key becomes AMBIGUOUS_REFERENCE (round-8 review)
        out = out.join(F.broadcast(dim), out[fk] == dim[dk], "left").drop(dim[dk])
    return out


def semi_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Semi-join reduction: shrink the fact side BEFORE its shuffle when the
    dim side is selective (filtered) but its *rows* are too wide or too many
    to broadcast-join directly.

    The dim's distinct join keys — typically a few MB of longs even when the
    dim's payload is GBs — are broadcast as a ``left_semi`` filter on the
    fact, so the expensive fact shuffle moves only rows that will actually
    find a partner; the real join then runs on the reduced side.  This is
    the exact-filter rendering of what Spark's runtime bloom-filter
    injection (``spark.sql.optimizer.runtime.bloomFilter.enabled``) does
    probabilistically, for the cases the optimizer declines (thresholds,
    non-selective-looking dims it cannot cost) or where exactness lets AQE
    skip the join side entirely.

    Use when |dim keys| fits a broadcast (tens of millions of longs).  If
    the dim is outright small, a plain ``F.broadcast`` join needs no prune;
    if the dim is huge AND unselective, nothing prunes — shuffle both.

    Only ``inner`` (and the degenerate ``left_semi``) are supported: the
    prune removes exactly the fact rows a ``left`` join must KEEP (they
    would surface with NULL dim columns) and a ``left_anti`` must RETURN —
    pruning first silently corrupts both (round-8 review).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(
            "semi_pruned_join supports how='inner' (or 'left_semi'); the "
            f"prune drops rows {how!r} semantics must keep — join without "
            "the prune instead"
        )
    keys = [on] if isinstance(on, str) else list(on)
    key_set = dim.select(*keys).distinct()
    pruned = fact.join(F.broadcast(key_set), keys, "left_semi")
    return pruned.join(dim, keys, how)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot key over ``n_salts``
    reducers.

    A shuffled equi-join sends every row of a key to ONE reducer, so a
    single hot key (a null-ish default id, a celebrity user, an empty-text
    digest) caps the join at 1-task speed no matter the cluster size.
    Salting breaks the tie: the fact side gets a uniform salt in
    [0, n_salts), the dim side is replicated once per salt value, and the
    join key becomes (key, salt) — the hot key now lands on n_salts tasks.
    Cost: the dim shuffle grows n_salts-fold, so use this when the dim is
    too big to broadcast but far smaller than the fact (else prefer
    ``F.broadcast`` which has no skew problem at all).  AQE's skew-join
    split handles moderate skew automatically; explicit salting is for the
    pathological single-key case AQE cannot split further (one key, one
    map output block).

    Only ``inner`` and ``left`` joins are supported: replicating the dim
    breaks right/full-outer multiplicity.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    # The salt is a pure function of row content + seed — NOT F.rand(),
    # whose draw depends on partition layout and can differ under task
    # retry (a retried task would re-salt its rows differently from the
    # map output a reducer already fetched).  Hashing only the join key
    # would defeat the purpose (one hot key -> one salt), so ALL columns
    # enter the hash: a hot key's rows spread because their payloads
    # differ.  Fully identical duplicate rows share a salt — harmless
    # unless the skew IS mass-identical rows, where exact dedup should
    # run first anyway.  Same partitioning-invariance stance as
    # operators/sampling.py's hash_uniform.
    salted_fact = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns], F.lit(seed)), F.lit(n_salts)).cast("int"),
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_fact.join(salted_dim, keys + ["__salt"], how).drop("__salt")
