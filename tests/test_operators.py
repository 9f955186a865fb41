"""Behavioural tests for the beyond-reference operators: planted
near-duplicates must be found, approximate search must hit recall targets,
and the streaming twin must reproduce the batch aggregation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Documents plus planted exact and near duplicates of doc 0-2."""
    base = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    originals = base.filter(F.col("doc_id") < 3).collect()
    planted = []
    for r in originals:
        planted.append((r.doc_id + 100000, r.text, r.lang, r.source, r.n_chars))  # exact
        words = r.text.split(" ")
        words[len(words) // 2] = "zzzmutant"
        planted.append((r.doc_id + 200000, " ".join(words), r.lang, r.source, r.n_chars))
    extra = spark.createDataFrame(planted, base.schema)
    return base.unionByName(extra).cache()


def test_minhash_finds_planted_near_dups(spark, docs_with_dups):
    from woe_monotonic_binning_spark.operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs_with_dups, "text", "doc_id", threshold=0.5).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    for d in range(3):
        assert (d, d + 100000) in found, f"exact dup of {d} missed"
        assert (d, d + 200000) in found, f"near dup of {d} missed"
    # jaccard of the exact pair must be 1.0
    exact = [p for p in pairs if p.id_a < 3 and p.id_b == p.id_a + 100000]
    assert all(abs(p.jaccard - 1.0) < 1e-9 for p in exact)


def test_simhash_finds_planted_dups(spark, docs_with_dups):
    from woe_monotonic_binning_spark.operators.dedup import simhash_near_pairs

    pairs = simhash_near_pairs(docs_with_dups, "text", "doc_id", max_hamming=3).collect()
    found = {(p.id_a, p.id_b): p.hamming for p in pairs}
    for d in range(3):
        assert found.get((d, d + 100000)) == 0, f"exact dup of {d}: hamming != 0"


def test_simhash_bucket_cap_degrades_to_star_not_drop(spark, docs_with_dups):
    """k identical/empty texts share every band value; without the cap the
    band self-join goes O(k^2) on one reducer.  With max_bucket below k the
    over-cap bucket degrades to O(k) STAR pairs around the min-id anchor
    (round 9 — dropping it zeroed recall for the hottest cluster): the
    degenerate docs stay one connected component through the anchor, but no
    quadratic non-anchor pair is generated.  Real dup pairs unaffected."""
    from woe_monotonic_binning_spark.operators.dedup import simhash_near_pairs

    k = 40
    junk = spark.createDataFrame(
        [(900000 + i, "", "en", "junk", 0) for i in range(k)],
        docs_with_dups.schema,
    )
    poisoned = docs_with_dups.unionByName(junk)
    capped = simhash_near_pairs(poisoned, "text", "doc_id", max_hamming=3, max_bucket=k - 1)
    capped_pairs = {(p.id_a, p.id_b) for p in capped.collect()}
    junk_pairs = {(a, b) for a, b in capped_pairs if a >= 900000 and b >= 900000}
    # exactly the star around the anchor: k-1 pairs, every one anchored
    assert junk_pairs == {(900000, 900000 + i) for i in range(1, k)}
    # true planted dups still found
    for d in range(3):
        assert (d, d + 100000) in capped_pairs


def test_minhash_bucket_cap_degrades_to_star_not_drop(spark):
    """MinHash twin of the star-fallback guarantee: a hot near-dup cluster
    larger than max_bucket yields anchor-star pairs (verified by exact
    Jaccard), so connected-components still collapses the cluster, at O(k)
    instead of O(k^2) pair cost."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_dedup_pairs,
    )

    base = " ".join(f"tok{i} common words here" for i in range(30))
    k = 12
    # identical texts -> identical signatures -> EVERY band bucket holds
    # the whole cluster and exceeds the cap (a varied-tail cluster would
    # leave some bands sub-cap and legitimately emit quadratic pairs
    # there, verified while building this test)
    rows = [(i, base) for i in range(k)]
    rows.append((500, "a completely different document about other things " * 5))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.7, max_bucket=k - 2)
    got = {(p.id_a, p.id_b) for p in pairs.collect()}
    # exactly the star around the min-id anchor; pre-round-9 drop
    # semantics produced the EMPTY set here
    cluster_pairs = {(a, b) for a, b in got if a < 500 and b < 500}
    assert cluster_pairs == {(0, i) for i in range(1, k)}
    # and the component resolution still collapses the whole cluster
    kept = dedup_keep_canonical(docs, pairs, "doc_id")
    kept_ids = {r.doc_id for r in kept.collect()}
    assert kept_ids == {0, 500}


@pytest.mark.certification  # slow battery; see pytest.ini (round 18)
def test_simhash_single_fold_matches_naive_per_bit(spark, docs_with_dups):
    """The round-4 rewrite folds the token-hash array ONCE into a 64-long
    bit-count accumulator (zip_with); the original form re-folded the array
    64 times (one aggregate per bit).  Same fingerprints, 64x less array
    traversal — this pins bit-for-bit equality on a real corpus."""
    from woe_monotonic_binning_spark.operators.dedup import simhash_fingerprints

    # the naive per-bit form, reconstructed from the pre-rewrite revision
    naive_bit_sum = (
        "transform(sequence(0, 63), j -> "
        "aggregate(tok_hashes, 0L, (acc, h) -> acc + IF(((h >> j) & 1) = 1, 1L, -1L)))"
    )
    bands = (
        "transform(sequence(0, 3), b -> "
        "aggregate(sequence(0, 15), 0L, (acc, j) -> acc + "
        "IF(element_at(bits, b * 16 + j + 1) > 0, shiftleft(1L, j), 0L)))"
    )
    naive = (
        docs_with_dups.select(
            F.col("doc_id"),
            F.expr(
                "transform(regexp_extract_all(lower(text), '[a-z0-9]+', 0), "
                "t -> xxhash64(t))"
            ).alias("tok_hashes"),
        )
        .select("doc_id", F.expr(naive_bit_sum).alias("bits"))
        .select("doc_id", F.expr(bands).alias("naive_bands"))
    )
    fast = simhash_fingerprints(docs_with_dups, "text", "doc_id")
    joined = fast.join(naive, "doc_id")
    assert joined.count() == docs_with_dups.count()
    mismatched = joined.filter(F.expr("sim_bands != naive_bands")).count()
    assert mismatched == 0


def test_minhash_single_fold_matches_per_perm(spark, docs_with_dups):
    """Round 17 folds the MinHash signature into ONE aggregate pass over the
    shingle hashes (a 64-wide zip_with running-minimum accumulator, the
    SimHash fold shape); the original form ran 64 separate
    array_min(transform(...)) passes each allocating a shingle-length
    intermediate.  Same signatures — this pins value-for-value equality on
    a real corpus (and thereby every band hash and candidate bucket
    downstream)."""
    import random

    from woe_monotonic_binning_spark.operators.dedup import (
        MERSENNE_31,
        minhash_signatures,
        shingled,
    )

    num_hashes, seed = 64, 42
    rnd = random.Random(seed)
    a = [rnd.randrange(1, MERSENNE_31) for _ in range(num_hashes)]
    b = [rnd.randrange(0, MERSENNE_31) for _ in range(num_hashes)]
    a_lit = "array(" + ",".join(f"{x}L" for x in a) + ")"
    b_lit = "array(" + ",".join(f"{x}L" for x in b) + ")"
    naive_sig = (
        "transform(sequence(0, {k}), i -> "
        "array_min(transform(hashes, h -> pmod(element_at({a}, i + 1) * h "
        "+ element_at({b}, i + 1), {p}))))"
    ).format(k=num_hashes - 1, a=a_lit, b=b_lit, p=MERSENNE_31)
    sh = shingled(docs_with_dups, "text", "doc_id", 3, "word")
    naive = sh.select(
        F.col("doc_id"),
        F.expr(f"transform(shingles, s -> pmod(xxhash64(s), {MERSENNE_31}))").alias(
            "hashes"
        ),
    ).select("doc_id", F.expr(naive_sig).alias("naive_signature"))
    fast = minhash_signatures(sh, "doc_id", num_hashes, seed)
    joined = fast.join(naive, "doc_id")
    assert joined.count() == docs_with_dups.count()
    assert joined.filter(F.expr("signature != naive_signature")).count() == 0


def test_minhash_hashed_shingle_pair_parity(spark, docs_with_dups):
    """Round 18 caches 31-bit HASHED shingle sets instead of the strings
    (guide §2.3) and verifies candidates with hashed-space Jaccard.  This
    reconstructs the OLD string-cached pipeline verbatim — string shingle
    cache, minhash_signatures over strings, jaccard_verify on string sets —
    and pins the full (id_a, id_b, jaccard) output byte-identical on a real
    corpus (the planted-dup fixture AND the sf0.01 documents table), so the
    collision argument is backed by measurement, not just probability."""
    from woe_monotonic_binning_spark.operators.dedup import (
        _lsh_candidate_pairs_lazy,
        jaccard_verify,
        minhash_dedup_pairs,
        minhash_signatures,
        shingled,
    )

    def old_pipeline(df, threshold):
        sh = shingled(df.select("doc_id", "text"), "text", "doc_id", 3, "word")
        sigs = minhash_signatures(sh, "doc_id", 64)
        cands, banded, counts = _lsh_candidate_pairs_lazy(
            sigs, "doc_id", 64, 16, max_bucket=1_000
        )
        return jaccard_verify(cands, sh, "doc_id", threshold)

    sf001_docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for df, threshold in ((docs_with_dups, 0.5), (sf001_docs, 0.5)):
        new = {
            (r.id_a, r.id_b, r.jaccard)
            for r in minhash_dedup_pairs(
                df, "text", "doc_id", threshold=threshold
            ).collect()
        }
        old = {
            (r.id_a, r.id_b, r.jaccard)
            for r in old_pipeline(df, threshold).collect()
        }
        assert new == old and len(new) > 0
    spark.catalog.clearCache()


def test_exact_dedup_shapes_agree(spark):
    """The merged q_dedup_exact certification slot (round 5) rests on
    exact_dedup and exact_dedup_by_digest sharing semantics: grouped on the
    same digest key they must emit identical (digest, keeper id, dup count)
    rows.  This pins the interchangeability the merged oracle row asserts."""
    from woe_monotonic_binning_spark.operators.dedup import (
        exact_dedup,
        exact_dedup_by_digest,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    generic = exact_dedup(
        docs.withColumn("digest", F.sha2(F.col("text").cast("binary"), 256)),
        ["digest"],
        "doc_id",
    ).select("digest", "doc_id", "n_dups")
    digest = exact_dedup_by_digest(docs, "text", "doc_id").select(
        "digest", "doc_id", "n_dups"
    )
    assert generic.count() == digest.count()
    assert generic.exceptAll(digest).count() == 0
    assert digest.exceptAll(generic).count() == 0


def test_connected_components_transitive_closure(spark):
    """A~B~C~D~E chains collapse to one cluster labelled by the min id;
    disjoint clusters stay disjoint; pointer jumping converges well inside
    max_iter on a chain (the worst shape for naive propagation)."""
    from woe_monotonic_binning_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 40)]  # 1-2-...-40, diameter 39
    pairs = spark.createDataFrame(
        chain + [(100, 101), (101, 102), (100, 102), (200, 201)],
        "id_a long, id_b long",
    )
    cc = {r.id: r.component for r in connected_components(pairs, max_iter=10).collect()}
    assert all(cc[i] == 1 for i in range(1, 41))
    assert all(cc[i] == 100 for i in (100, 101, 102))
    assert cc[200] == cc[201] == 200


def test_connected_components_duplicate_edges_match_distinct(spark):
    """Duplicate, repeated and reversed pairs must yield exactly the
    components of the distinct pair set: every label step is a MIN over
    the neighborhood and min(multiset) == min(set), which is what lets
    connected_components skip the former eager edge distinct (round 17 —
    one full shuffle of the doubled edge table per call)."""
    from woe_monotonic_binning_spark.operators.dedup import connected_components

    clean = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22)]
    noisy = clean * 3 + [(b, a) for a, b in clean] + [(3, 2), (11, 10)]
    cc_clean = {
        r.id: r.component
        for r in connected_components(
            spark.createDataFrame(clean, "id_a long, id_b long"), max_iter=10
        ).collect()
    }
    cc_noisy = {
        r.id: r.component
        for r in connected_components(
            spark.createDataFrame(noisy, "id_a long, id_b long"), max_iter=10
        ).collect()
    }
    assert cc_noisy == cc_clean
    assert cc_clean[3] == 1 and cc_clean[22] == 20


def test_connected_components_fused_min_step_matches_join(spark):
    """Round 18: the per-round min-label step fused the labels-join into
    the neighborhood aggregation (min over neighbor labels UNION own label
    == least(own, min-neighbor)).  Pin the algebra directly — one old-style
    join step vs one fused step over the same label table must emit the
    identical stepped table — and pin end-to-end labels against a
    driver-side union-find ground truth on random graphs."""
    import random

    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.dedup import connected_components

    # algebraic pin on one round
    rnd = random.Random(181)
    raw = [(rnd.randrange(40), rnd.randrange(40)) for _ in range(60)]
    raw = [(a, b) for a, b in raw if a != b]
    pairs = spark.createDataFrame(raw, "id_a long, id_b long")
    edges = pairs.selectExpr("id_a as src", "id_b as dst").union(
        pairs.selectExpr("id_b as src", "id_a as dst")
    )
    labels = edges.groupBy("dst").agg(F.min("src").alias("__nm")).select(
        F.col("dst").alias("id"), F.least("dst", "__nm").alias("label")
    )
    nbr_min = (
        edges.join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy("dst")
        .agg(F.min("label").alias("nbr_min"))
        .withColumnRenamed("dst", "id")
    )
    old_step = {
        (r.id, r.label)
        for r in labels.join(nbr_min, "id", "left")
        .select(
            "id",
            F.least("label", F.coalesce("nbr_min", F.col("label"))).alias("label"),
        )
        .collect()
    }
    fused_step = {
        (r.id, r.label)
        for r in edges.join(labels.withColumnRenamed("id", "src"), "src")
        .select(F.col("dst").alias("id"), "label")
        .unionByName(labels)
        .groupBy("id")
        .agg(F.min("label").alias("label"))
        .collect()
    }
    assert fused_step == old_step

    # end-to-end ground truth on random graphs
    for seed in (7, 18, 99):
        rnd = random.Random(seed)
        es = {(rnd.randrange(120), rnd.randrange(120)) for _ in range(150)}
        es = [(a, b) for a, b in es if a != b]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        truth = {x: find(x) for x in parent}
        got = {
            r.id: r.component
            for r in connected_components(
                spark.createDataFrame(es, "id_a long, id_b long"), max_iter=25
            ).collect()
        }
        assert got == truth


def test_connected_components_nonconvergence_raises(spark):
    """An undersized max_iter must fail LOUDLY: returning partially-merged
    labels would make the canonical-keep filter silently drop the wrong docs.
    The 40-node chain needs ~log2(39) pointer-jumping rounds, so max_iter=1
    (plus the one confirming round) cannot reach the fixed point."""
    from woe_monotonic_binning_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(1, 40)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="max_iter"):
        connected_components(pairs, max_iter=1)


def test_connected_components_converges_exactly_at_max_iter(spark):
    """A graph whose fixed point lands exactly on the max_iter-th productive
    round must RETURN, not raise: the budget bounds productive rounds, with
    one extra stationary-confirmation round allowed (ADVICE r4).  A triangle
    converges in exactly one productive round."""
    from woe_monotonic_binning_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(100, 101), (101, 102), (100, 102)], "id_a long, id_b long"
    )
    cc = {r.id: r.component for r in connected_components(pairs, max_iter=1).collect()}
    assert cc == {100: 100, 101: 100, 102: 100}


def test_dedup_keep_canonical_collapses_planted_dups(spark, docs_with_dups):
    """End-to-end dedup: pair generation -> transitive clustering -> keep
    exactly one doc per cluster (the min id) plus all unpaired docs."""
    from woe_monotonic_binning_spark.operators.dedup import (
        dedup_keep_canonical,
        minhash_dedup_pairs,
    )

    pairs = minhash_dedup_pairs(docs_with_dups, "text", "doc_id", threshold=0.5)
    kept = dedup_keep_canonical(docs_with_dups, pairs, "doc_id")
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    paired = {x for p in pairs.collect() for x in (p.id_a, p.id_b)}
    n_docs = docs_with_dups.count()
    # the planted copies of docs 0-2 are gone, their originals kept
    for d in range(3):
        assert d in kept_ids
        assert d + 100000 not in kept_ids and d + 200000 not in kept_ids
    # every unpaired doc survives; total = unpaired + one per cluster
    unpaired = {r.doc_id for r in docs_with_dups.select("doc_id").collect()} - paired
    assert unpaired <= kept_ids
    assert len(kept_ids) == n_docs - len(paired) + len(kept_ids & paired)


def test_dedup_keep_best_policy(spark, docs_with_dups):
    """keep-best by a quality column keeps exactly one doc per cluster (the
    max of the order column, ties to min id); with ascending doc_id as the
    order it degenerates to exactly dedup_keep_canonical."""
    from woe_monotonic_binning_spark.operators.dedup import (
        dedup_keep_best,
        dedup_keep_canonical,
        minhash_dedup_pairs,
    )

    pairs = minhash_dedup_pairs(docs_with_dups, "text", "doc_id", threshold=0.5)
    kept = dedup_keep_best(docs_with_dups, pairs, "doc_id", "doc_id", descending=True)
    # clusters of {d, d+100000, d+200000}: descending doc_id keeps the copy
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    for d in range(3):
        assert d not in kept_ids and (d + 200000) in kept_ids
    # one survivor per component
    assert kept.groupBy("component").count().filter(F.col("count") > 1).count() == 0
    # ascending-id policy == canonical min-id keep
    asc = dedup_keep_best(docs_with_dups, pairs, "doc_id", "doc_id", descending=False)
    canon = dedup_keep_canonical(docs_with_dups, pairs, "doc_id")
    assert {r.doc_id for r in asc.select("doc_id").collect()} == {
        r.doc_id for r in canon.select("doc_id").collect()
    }


def test_minhash_jaccard_estimates_match_exact(spark, docs_with_dups):
    """MinHash candidates verified by exact Jaccard >= LSH design range."""
    from woe_monotonic_binning_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    mh = {
        (p.id_a, p.id_b): p.jaccard
        for p in minhash_dedup_pairs(
            docs_with_dups, "text", "doc_id", threshold=0.8
        ).collect()
    }
    # verification step outputs exact jaccard, so every reported pair >= 0.8
    assert mh
    assert all(j >= 0.8 for j in mh.values())


def test_ivf_recall_vs_brute_force(spark):
    from woe_monotonic_binning_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_centroids,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 20)
    brute = brute_force_topk(emb, queries, k=5).collect()
    cents = train_centroids(emb, n_cells=8)
    approx = ivf_topk(emb, queries, cents, k=5, n_probe=4).collect()
    truth = {(r.query_id, r.neighbor_id) for r in brute}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"IVF recall {recall:.2f} below target"


def test_ivf_index_roundtrip_matches_inline(spark, tmp_path):
    """A saved cell-partitioned index serves identical results to the inline
    IVF path, and the probe scan actually partition-prunes."""
    from woe_monotonic_binning_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_index,
        save_ivf_index,
        train_centroids,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 10)
    cents = train_centroids(emb, n_cells=8)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, cents, path)

    inline = sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank)
        for r in ivf_topk(emb, queries, cents, k=5, n_probe=3).collect()
    )
    served = ivf_topk_index(spark, path, queries, k=5, n_probe=3)
    assert inline == sorted(
        (r.query_id, r.neighbor_id, r.cosine, r.rank) for r in served.collect()
    )
    # pruning is visible in the scan: the cell IN-list lands in
    # PartitionFilters, not PushedFilters — only probed dirs are read.
    assigned = spark.read.parquet(f"{path}/assigned").filter(F.col("cell").isin([0, 1]))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split("PartitionFilters")[1][:80]


def test_ivf_index_append_matches_full_rebuild(spark, tmp_path):
    """Incremental maintenance: an index built on half the corpus and
    appended with the other half serves results identical to an index
    built on the full corpus with the SAME centroids, and the append only
    touches the new batch's cell partitions (old files untouched)."""
    import glob
    import os

    from woe_monotonic_binning_spark.operators.similarity import (
        ivf_index_append,
        ivf_topk_index,
        save_ivf_index,
        train_centroids,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    old = emb.filter(F.col("vec_id") < 250)
    new = emb.filter(F.col("vec_id") >= 250)
    queries = emb.filter(F.col("vec_id") < 10)
    cents = train_centroids(old, n_cells=8)

    inc_path = str(tmp_path / "ivf_inc")
    save_ivf_index(old, cents, inc_path)
    before = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{inc_path}/assigned/cell=*/part-*.parquet")
    }
    ivf_index_append(spark, inc_path, new)
    after = set(glob.glob(f"{inc_path}/assigned/cell=*/part-*.parquet"))
    # old files still present and untouched; new files appended
    assert set(before) <= after and len(after) > len(before)
    assert all(os.path.getmtime(f) == m for f, m in before.items())

    full_path = str(tmp_path / "ivf_full")
    save_ivf_index(emb, cents, full_path)

    inc = ivf_topk_index(spark, inc_path, queries, k=5, n_probe=3)
    full = ivf_topk_index(spark, full_path, queries, k=5, n_probe=3)
    key = lambda r: (r.query_id, r.neighbor_id, r.cosine, r.rank)  # noqa: E731
    served = sorted(map(key, inc.collect()))
    assert served == sorted(map(key, full.collect()))

    # compaction: one file per cell afterwards, identical serving results
    from woe_monotonic_binning_spark.operators.similarity import compact_ivf_index

    compact_ivf_index(spark, inc_path)
    for cell_dir in glob.glob(f"{inc_path}/assigned/cell=*"):
        parts = glob.glob(os.path.join(cell_dir, "part-*.parquet"))
        assert len(parts) == 1, f"{cell_dir} holds {len(parts)} files"
    assert not os.path.exists(f"{inc_path}/assigned_compacting")
    assert not os.path.exists(f"{inc_path}/assigned_old")
    recompacted = ivf_topk_index(spark, inc_path, queries, k=5, n_probe=3)
    assert served == sorted(map(key, recompacted.collect()))
    emb.unpersist()


def test_compact_ivf_index_recovers_from_crash_between_renames(spark, tmp_path):
    """Round-9 advice: a crash between compact_ivf_index's two renames
    leaves assigned_old but no assigned.  The next compaction must
    restore the serving copy at entry (and finish normally) instead of
    reading a missing path; and after any successful compaction the
    backup is deleted only once {path}/assigned exists."""
    import glob
    import os
    import shutil

    from woe_monotonic_binning_spark.operators.similarity import (
        compact_ivf_index,
        ivf_topk_index,
        save_ivf_index,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    cents = train_centroids(emb, n_cells=4)
    path = str(tmp_path / "ivf")
    save_ivf_index(emb, cents, path)
    queries = emb.filter(F.col("vec_id") < 5)
    key = lambda r: (r.query_id, r.neighbor_id, r.cosine, r.rank)  # noqa: E731
    served = sorted(map(key, ivf_topk_index(spark, path, queries, k=3).collect()))

    # simulate the crash window: serving copy renamed to backup, swap
    # never happened
    shutil.move(f"{path}/assigned", f"{path}/assigned_old")
    assert not os.path.exists(f"{path}/assigned")

    compact_ivf_index(spark, path)
    assert os.path.exists(f"{path}/assigned")
    assert not os.path.exists(f"{path}/assigned_old")
    assert not os.path.exists(f"{path}/assigned_compacting")
    for cell_dir in glob.glob(f"{path}/assigned/cell=*"):
        assert len(glob.glob(os.path.join(cell_dir, "part-*.parquet"))) == 1
    after = sorted(map(key, ivf_topk_index(spark, path, queries, k=3).collect()))
    assert after == served


def test_train_centroids_element_wise_means_dim256(spark):
    """The posexplode mean computation must produce the exact per-cell
    element-wise means (the semantics of the former per-dimension
    avg(element_at) form) and must work at real embedding widths — the old
    form generated one aggregate expression per dimension."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.similarity import (
        assign_cells,
        train_centroids,
    )

    rng = np.random.RandomState(0)
    data = [(i, [float(x) for x in rng.standard_normal(256)]) for i in range(80)]
    df = spark.createDataFrame(data, "vec_id long, embedding array<double>")
    seeds = [row[1] for row in data[:4]]  # train_centroids seeds: lowest ids
    by_cell: dict[int, list] = {}
    for r in assign_cells(df, seeds).collect():
        by_cell.setdefault(r.cell, []).append(np.array(r.embedding))
    expected = [
        np.mean(by_cell[c], axis=0) if c in by_cell else np.array(seeds[c])
        for c in range(4)
    ]
    got = train_centroids(df, n_cells=4, lloyd_iters=1)
    assert len(got) == 4 and all(len(c) == 256 for c in got)
    for e, g in zip(expected, got):
        assert np.allclose(e, np.array(g), atol=1e-9)


def test_winnow_match_pairs_driver_corpus(spark):
    """winnow_match_pairs must run on the REAL driver documents table, not
    just the tiny synthetic test corpus: before round 5 the un-persisted
    fingerprint lineage collapsed into the explode's generator child and was
    re-evaluated per emitted element — minutes of spin on 500 ~300-char
    docs.  With the fingerprints persisted this completes in seconds; the
    pair set must be symmetric-free and thresholded."""
    from woe_monotonic_binning_spark.operators.text import winnow_match_pairs

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pairs = winnow_match_pairs(docs, min_shared=3).collect()
    assert len(pairs) > 0
    assert all(p.id_a < p.id_b and p.n_shared >= 3 for p in pairs)


def test_streaming_tumbling_matches_batch(spark):
    from woe_monotonic_binning_spark.sources.tables import (
        load_table,
        microsecond_parquet_copy,
    )
    from woe_monotonic_binning_spark.streaming.events import (
        read_events_stream,
        run_available_now,
        streaming_tumbling_agg,
    )

    sf = "/root/testdata/sf0.01"
    stream = read_events_stream(spark, microsecond_parquet_copy(sf, "events"))
    streamed = run_available_now(streaming_tumbling_agg(stream), "t_stream_sink").toPandas()

    ev = load_table(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    batch = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .toPandas()
    )
    key = ["window_start", "event_type"]
    streamed = streamed.sort_values(key).reset_index(drop=True)
    batch = batch.sort_values(key).reset_index(drop=True)
    assert len(streamed) == len(batch)
    assert (streamed["n_events"].to_numpy() == batch["n_events"].to_numpy()).all()
    assert np.allclose(streamed["total_value"], batch["total_value"])


def test_multimodal_decode_roundtrip(spark):
    import hashlib

    from woe_monotonic_binning_spark.operators.multimodal import (
        fake_decode_stats,
        media_from_documents,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = fake_decode_stats(media_from_documents(docs)).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(stats) == len(texts)
    for r in stats[:20]:
        raw = texts[r.media_id].encode("utf-8")
        assert r.n_bytes == len(raw)
        assert r.checksum == hashlib.md5(raw).hexdigest()
        assert r.first_byte == raw[0]


def test_decode_image_ppm_real_pixels(spark):
    """decode_image is a REAL decoder (round 10): synthetic JVM-built P6
    payloads decode to the exact per-channel integer sums; malformed and
    NULL payloads yield NULL-fmt rows instead of killing the worker."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_ppm_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = {r.media_id: r for r in decode_image(synthetic_ppm_media(docs)).collect()}
    assert len(out) == docs.count()
    for mid, r in list(out.items())[:50]:
        assert r.fmt == "ppm" and (r.width, r.height, r.n_pixels) == (4, 2, 8)
        assert r.sum_r == 8 * (mid % 256)
        assert r.sum_g == 8 * ((mid * 7) % 256)
        assert r.sum_b == 8 * ((mid * 13) % 256)

    bad = spark.createDataFrame(
        [
            (1, "image", bytearray(b"P6\n2 2\n255\n\x00\x01")),  # truncated raster
            (2, "image", bytearray(b"\x89PNG\r\n\x1a\n....")),  # unsupported codec
            (3, "image", None),  # NULL payload
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(bad).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r.fmt is None and r.n_pixels is None and r.sum_r is None


def test_decode_image_bmp_matches_ppm_pixels(spark):
    """The BMP arm: hand-built 24-bit BI_RGB payloads (both bottom-up and
    top-down rasters, with 4-byte row padding) decode to the same channel
    sums as the equivalent P6 bytes — the two real formats agree on the
    same pixels."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import decode_image

    pix = [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (200, 210, 220)]]  # RGB rows

    def bmp_bytes(topdown):
        w, h = 2, 2
        stride = (w * 3 + 3) & ~3
        rows = pix if topdown else pix[::-1]
        raster = b"".join(
            b"".join(bytes((b_, g, r)) for (r, g, b_) in row)
            + b"\x00" * (stride - w * 3)
            for row in rows
        )
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, (-h if topdown else h), 1, 24, 0,
            len(raster), 2835, 2835, 0, 0,
        )
        return hdr + dib + raster

    flat = [c for row in pix for p in row for c in p]
    ppm = b"P6\n2 2\n255\n" + bytes(flat)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(bmp_bytes(False))),
            (2, "image", bytearray(bmp_bytes(True))),
            (3, "image", bytearray(ppm)),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(media).collect()}
    assert rows[1].fmt == "bmp" and rows[2].fmt == "bmp" and rows[3].fmt == "ppm"
    want = (
        sum(p[0] for row in pix for p in row),
        sum(p[1] for row in pix for p in row),
        sum(p[2] for row in pix for p in row),
    )
    for r in rows.values():
        assert (r.width, r.height, r.n_pixels) == (2, 2, 4)
        assert (r.sum_r, r.sum_g, r.sum_b) == want


def _png_bytes(w, h, color, raw, real_checksums=True, plte=None, trns=None):
    """Assemble a PNG from an already-FILTERED raw stream (the scanline
    bytes including per-row filter tags) — checksums real by default so
    the fixture is a spec-valid PNG any decoder accepts.  ``plte``/
    ``trns`` insert PLTE / tRNS chunks (palette fixtures, round 12)."""
    import struct
    import zlib

    def chunk(ctype, data):
        crc = zlib.crc32(ctype + data) if real_checksums else 0
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(raw)
    mid = b""
    if plte is not None:
        mid += chunk(b"PLTE", bytes(plte))
    if trns is not None:
        mid += chunk(b"tRNS", bytes(trns))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + mid
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def test_decode_image_png_all_filters_golden(spark):
    """The PNG arm (round 11): a hand-assembled 2x5 RGB PNG whose five
    scanlines use filter types 0/1/2/3/4 — the filtered bytes are spelled
    LITERALLY here (computed by hand from the PNG spec, sharing no code
    with the decoder), so a wrong predictor inversion cannot cancel out.
    Expected sums come from the intended RAW pixels."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_image

    # raw pixels (RGB, w=2, h=5) the filtered stream below encodes:
    # r0 (10,20,30)(40,50,60)   r1 (15,25,35)(45,55,65)
    # r2 (20,30,40)(50,60,70)   r3 (100,110,120)(130,140,150)
    # r4 (200,0,50)(60,255,5)
    raw = bytes(
        [0, 10, 20, 30, 40, 50, 60]  # None
        + [1, 15, 25, 35, 30, 30, 30]  # Sub
        + [2, 5, 5, 5, 5, 5, 5]  # Up
        + [3, 90, 95, 100, 55, 55, 55]  # Average
        + [4, 100, 146, 186, 116, 255, 211]  # Paeth
    )
    media = spark.createDataFrame(
        [(1, "image", bytearray(_png_bytes(2, 5, 2, raw)))],
        "media_id long, kind string, content binary",
    )
    r = decode_image(media).collect()[0]
    assert r.fmt == "png" and (r.width, r.height, r.n_pixels) == (2, 5, 10)
    assert (r.sum_r, r.sum_g, r.sum_b) == (670, 745, 625)


def test_decode_image_png_rgba_and_rejects(spark):
    """RGBA (color type 6) drops alpha from the channel sums; palette /
    16-bit / interlaced / truncated payloads fall through to the NULL-fmt
    row instead of erroring (the honest-reject contract)."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_image

    # 2x1 RGBA, filter 0: (10,20,30,alpha 99) (40,50,60,alpha 1)
    rgba = bytes([0, 10, 20, 30, 99, 40, 50, 60, 1])
    good = _png_bytes(2, 1, 6, rgba)
    # grayscale (color 0) replicates to r=g=b; gray+alpha (4) drops alpha
    gray = _png_bytes(3, 1, 0, bytes([1, 10, 10, 10]))  # Sub: 10,20,30
    graya = _png_bytes(2, 1, 4, bytes([0, 7, 200, 9, 1]))
    palette = _png_bytes(2, 1, 2, bytes([0, 1, 2, 3, 4, 5, 6])).replace(
        b"\x08\x02\x00\x00\x00", b"\x08\x03\x00\x00\x00", 1
    )
    rgb_row = bytes([0, 1, 2, 3, 4, 5, 6])
    bad16 = _png_bytes(2, 1, 2, rgb_row)
    bad16 = bad16.replace(b"\x08\x02\x00\x00\x00", b"\x10\x02\x00\x00\x00", 1)
    interlaced = _png_bytes(2, 1, 2, rgb_row)
    interlaced = interlaced.replace(
        b"\x08\x02\x00\x00\x00", b"\x08\x02\x00\x00\x01", 1
    )
    truncated = _png_bytes(4, 4, 2, bytes([0] * 13))  # raster shorter than 4x4
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(good)),
            (2, "image", bytearray(bad16)),
            (3, "image", bytearray(interlaced)),
            (4, "image", bytearray(truncated)),
            (5, "image", bytearray(gray)),
            (6, "image", bytearray(graya)),
            (7, "image", bytearray(palette)),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(media).collect()}
    assert rows[1].fmt == "png"
    assert (rows[1].sum_r, rows[1].sum_g, rows[1].sum_b) == (50, 70, 90)
    assert rows[5].fmt == "png"
    assert (rows[5].sum_r, rows[5].sum_g, rows[5].sum_b) == (60, 60, 60)
    assert rows[6].fmt == "png"
    assert (rows[6].sum_r, rows[6].sum_g, rows[6].sum_b) == (16, 16, 16)
    for mid in (2, 3, 4, 7):
        assert rows[mid].fmt is None and rows[mid].sum_r is None


def test_decode_image_png_palette_golden(spark):
    """Color type 3 (round 12): indices expand through PLTE entries; a
    spec-valid hand-built fixture with per-pixel VARYING indices (so an
    index-offset bug shifts the sums), a Sub-filtered index row (filters
    operate on the index bytes, before palette expansion), an ignored
    tRNS chunk, and the reject shapes (out-of-range index, malformed
    PLTE length)."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_image

    plte = bytes([10, 5, 20, 50, 85, 80, 90, 165, 140])
    # 3x2: row0 filter 0, indices 0,1,2; row1 Sub: 2, then +255 (=left-1
    # mod 256 -> 1), then +255 (-> 0) — expansion AFTER unfiltering
    raw = bytes([0, 0, 1, 2] + [1, 2, 255, 255])
    good = _png_bytes(3, 2, 3, raw, plte=plte, trns=bytes([255, 128, 0]))
    # expected raw indices: (0,1,2),(2,1,0) -> each entry twice
    exp = tuple(2 * (plte[c] + plte[3 + c] + plte[6 + c]) for c in range(3))
    oob = _png_bytes(1, 1, 3, bytes([0, 3]), plte=plte)  # index 3 of 3-entry
    badlen = _png_bytes(1, 1, 3, bytes([0, 0]), plte=plte[:5])  # len % 3 != 0
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(good)),
            (2, "image", bytearray(oob)),
            (3, "image", bytearray(badlen)),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(media).collect()}
    assert rows[1].fmt == "png" and (rows[1].width, rows[1].height) == (3, 2)
    assert (rows[1].sum_r, rows[1].sum_g, rows[1].sum_b) == exp
    for mid in (2, 3):
        assert rows[mid].fmt is None and rows[mid].sum_r is None
    # tRNS-ignore DECISION pin (round 14): under the RGB stats contract
    # alpha is dropped for every color type, so the same image with and
    # without a tRNS chunk must emit IDENTICAL rows
    no_trns = _png_bytes(3, 2, 3, raw, plte=plte)
    twin = spark.createDataFrame(
        [(1, "image", bytearray(good)), (2, "image", bytearray(no_trns))],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in decode_image(twin).collect()}
    assert got[1][1:] == got[2][1:]


def test_decode_image_png_palette_jvm_fixture(spark):
    """synthetic_png_palette_media (JVM-built, zeroed checksums) decodes
    to the id%3 arithmetic the catalog 'palette' oracle section encodes —
    the local twin of the driver-hash certification."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        _PALETTE,
        decode_image,
        synthetic_png_palette_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(64)
    rows = {
        r.media_id: r
        for r in decode_image(synthetic_png_palette_media(docs)).collect()
    }
    assert len(rows) == 64
    tot = [sum(e[c] for e in _PALETTE) for c in range(3)]
    for mid, r in rows.items():
        assert r.fmt == "png" and (r.width, r.height, r.n_pixels) == (4, 2, 8)
        k = mid % 3
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(
            2 * (tot[c] + _PALETTE[k][c]) for c in range(3)
        )


def test_decode_image_png_jvm_fixture_matches_ppm(spark):
    """synthetic_png_media (JVM-built stored-DEFLATE payloads, zeroed
    checksums) decodes byte-for-byte to the same channel sums as the PPM
    fixture for the same ids — the catalog 'png' section's local twin."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_png_media,
        synthetic_ppm_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(64)
    png = {r.media_id: r for r in decode_image(synthetic_png_media(docs)).collect()}
    ppm = {r.media_id: r for r in decode_image(synthetic_ppm_media(docs)).collect()}
    assert set(png) == set(ppm) and len(png) == 64
    for mid, r in png.items():
        assert r.fmt == "png" and ppm[mid].fmt == "ppm"
        assert (r.width, r.height, r.n_pixels, r.sum_r, r.sum_g, r.sum_b) == (
            ppm[mid].width, ppm[mid].height, ppm[mid].n_pixels,
            ppm[mid].sum_r, ppm[mid].sum_g, ppm[mid].sum_b,
        )
        assert r.sum_r == 8 * (mid % 256)


# --- FLAC (round 14): scratch bit-writer encoder, independent of the
# engine's JVM fixture builder, exercising every supported subframe and
# stereo path of _parse_flac -------------------------------------------------


class _FlacW:
    def __init__(self):
        self.bits = []

    def w(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ws(self, v, n):
        self.w(v & ((1 << n) - 1), n)

    def unary(self, q):
        self.bits.extend([0] * q + [1])

    def out(self):
        while len(self.bits) % 8:
            self.bits.append(0)
        return bytes(
            int("".join(map(str, self.bits[i : i + 8])), 2)
            for i in range(0, len(self.bits), 8)
        )


def _flac_streaminfo(bs=16, rate=8000, nch=1, bps=16, total=16):
    return (
        bytes([0x80, 0, 0, 34]) + bs.to_bytes(2, "big") * 2
        + b"\x00\x00\x00" * 2
        + bytes([(rate >> 12) & 0xFF, (rate >> 4) & 0xFF,
                 ((rate & 0xF) << 4) | ((nch - 1) << 1) | ((bps - 1) >> 4),
                 ((bps - 1) & 0xF) << 4])
        + total.to_bytes(4, "big") + b"\x00" * 16
    )


def _flac_frame(subenc, ch_code=0, bs=16, rate_code=4):
    from woe_monotonic_binning_spark.operators.multimodal import _crc8, _crc16

    w = _FlacW()
    w.w(0x3FFE, 14); w.w(0, 2)
    w.w(6, 4); w.w(rate_code, 4); w.w(ch_code, 4); w.w(4, 3); w.w(0, 1)
    w.w(0, 8)  # frame number 0
    w.w(bs - 1, 8)  # 8-bit blocksize-1 (code 6)
    hdr = w.out()
    hdr += bytes([_crc8(hdr)])
    wb = _FlacW()
    subenc(wb)
    frame = hdr + wb.out()
    return frame + _crc16(frame).to_bytes(2, "big")


def _flac_rice(w, res, p):
    for r in res:
        v = (r << 1) if r >= 0 else ((-r) << 1) - 1
        w.unary(v >> p)
        if p:
            w.w(v & ((1 << p) - 1), p)


def _flac_verbatim(w, samples, bps):
    w.w(0, 1); w.w(1, 6); w.w(0, 1)
    for s in samples:
        w.ws(s, bps)


def _flac_fixed(w, samples, order, bps, p=3):
    w.w(0, 1); w.w(8 + order, 6); w.w(0, 1)
    for s in samples[:order]:
        w.ws(s, bps)
    coef = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}[order]
    w.w(0, 2); w.w(0, 4); w.w(p, 4)
    _flac_rice(
        w,
        [s - sum(c * samples[i - j - 1] for j, c in enumerate(coef))
         for i, s in enumerate(samples) if i >= order],
        p,
    )


def test_parse_flac_subframe_and_stereo_paths():
    """Every supported decode path against the scratch encoder: verbatim,
    fixed orders 0-4 with Rice residuals (both parameter widths, escape
    partitions, partition order 2), all three stereo decorrelations with
    the side channel's extra bit, wasted bits, multiple frames."""
    import random

    from woe_monotonic_binning_spark.operators.multimodal import _parse_flac

    rng = random.Random(7)
    samples = [rng.randint(-3000, 3000) for _ in range(16)]
    b = b"fLaC" + _flac_streaminfo() + _flac_frame(
        lambda w: _flac_verbatim(w, samples, 16)
    )
    assert _parse_flac(b) == (1, 8000, 16, [sum(samples)])
    for order in range(5):
        sm = [rng.randint(-500, 500) for _ in range(16)]
        b = b"fLaC" + _flac_streaminfo() + _flac_frame(
            lambda w: _flac_fixed(w, sm, order, 16)
        )
        assert _parse_flac(b) == (1, 8000, 16, [sum(sm)]), order
    L = [rng.randint(-100, 100) for _ in range(16)]
    R = [rng.randint(-100, 100) for _ in range(16)]
    side = [x - y for x, y in zip(L, R)]
    mid = [(x + y) >> 1 for x, y in zip(L, R)]
    for ch_code, (c0, b0), (c1, b1) in (
        (1, (L, 16), (R, 16)),          # independent stereo
        (8, (L, 16), (side, 17)),       # left/side
        (9, (side, 17), (R, 16)),       # side/right
        (10, (mid, 16), (side, 17)),    # mid/side
    ):
        b = b"fLaC" + _flac_streaminfo(nch=2) + _flac_frame(
            lambda w: (_flac_verbatim(w, c0, b0), _flac_verbatim(w, c1, b1)),
            ch_code=ch_code,
        )
        assert _parse_flac(b) == (2, 8000, 16, [sum(L), sum(R)]), ch_code
    # wasted bits: all-even samples stored at bps-1 with 1 wasted bit
    ev = [rng.randint(-500, 500) * 2 for _ in range(16)]

    def enc_wasted(w):
        w.w(0, 1); w.w(1, 6); w.w(1, 1); w.unary(0)
        for s in ev:
            w.ws(s >> 1, 15)

    b = b"fLaC" + _flac_streaminfo() + _flac_frame(enc_wasted)
    assert _parse_flac(b) == (1, 8000, 16, [sum(ev)])
    # escape partition (raw 9-bit), rice method 1, partition order 2
    sm = [rng.randint(-200, 200) for _ in range(16)]

    def enc_escape(w):
        w.w(0, 1); w.w(8, 6); w.w(0, 1)
        w.w(0, 2); w.w(0, 4); w.w(0xF, 4); w.w(9, 5)
        for s in sm:
            w.ws(s, 9)

    def enc_rice5(w):
        w.w(0, 1); w.w(8, 6); w.w(0, 1)
        w.w(1, 2); w.w(0, 4); w.w(3, 5)
        _flac_rice(w, sm, 3)

    def enc_po2(w):
        w.w(0, 1); w.w(9, 6); w.w(0, 1)
        w.ws(sm[0], 16)
        res = [sm[i] - sm[i - 1] for i in range(1, 16)]
        idx = 0
        w.w(0, 2); w.w(2, 4)
        for part in range(4):
            n = 4 - (1 if part == 0 else 0)
            w.w(4, 4)
            _flac_rice(w, res[idx : idx + n], 4)
            idx += n

    for enc in (enc_escape, enc_rice5, enc_po2):
        b = b"fLaC" + _flac_streaminfo() + _flac_frame(enc)
        assert _parse_flac(b) == (1, 8000, 16, [sum(sm)]), enc.__name__
    # two frames accumulate
    f = _flac_frame(lambda w: _flac_verbatim(w, sm, 16))
    assert _parse_flac(b"fLaC" + _flac_streaminfo(total=32) + f + f) == (
        1, 8000, 32, [2 * sum(sm)]
    )
    # 32-bit stereo left/side: the side channel is 33-bit (round-14
    # review — a bps cap of 32 wrongly rejected it)
    from woe_monotonic_binning_spark.operators.multimodal import _crc8, _crc16

    L32 = [2**30, -(2**30), 123456789, -987654321] * 4
    R32 = [-(2**30), 2**30, -1, 1] * 4
    s32 = [x - y for x, y in zip(L32, R32)]

    def frame32(subenc, ch_code):
        w = _FlacW()
        w.w(0x3FFE, 14); w.w(0, 2)
        w.w(6, 4); w.w(4, 4); w.w(ch_code, 4); w.w(7, 3); w.w(0, 1)
        w.w(0, 8); w.w(15, 8)
        hdr = w.out(); hdr += bytes([_crc8(hdr)])
        wb = _FlacW(); subenc(wb)
        fr = hdr + wb.out()
        return fr + _crc16(fr).to_bytes(2, "big")

    b = b"fLaC" + _flac_streaminfo(nch=2, bps=32) + frame32(
        lambda w: (_flac_verbatim(w, L32, 32), _flac_verbatim(w, s32, 33)), 8
    )
    assert _parse_flac(b) == (2, 8000, 16, [sum(L32), sum(R32)])


def _flac_lpc(w, samples, order, bps, coef, prec, shift, p=4):
    w.w(0, 1); w.w(32 + order - 1, 6); w.w(0, 1)
    for s in samples[:order]:
        w.ws(s, bps)
    w.w(prec - 1, 4); w.w(shift, 5)
    for c in coef:
        w.ws(c, prec)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - j - 1] for j, c in enumerate(coef)) >> shift
        res.append(samples[i] - pred)
    w.w(0, 2); w.w(0, 4); w.w(p, 4)
    _flac_rice(w, res, p)


def test_parse_flac_lpc_subframes():
    """LPC subframes (round 14): quantized-coefficient prediction with
    the ARITHMETIC shift (floor toward -inf on negative sums — Python's
    >> semantics, pinned by a negative-prediction case), orders 1 to the
    max 32, and the reject set: precision code 0b1111, negative
    (two's-complement) shift."""
    import random

    from woe_monotonic_binning_spark.operators.multimodal import _parse_flac

    rng = random.Random(11)
    # order 2, coef (3, -1), shift 1 over random samples
    sm = [rng.randint(-400, 400) for _ in range(16)]
    b = b"fLaC" + _flac_streaminfo() + _flac_frame(
        lambda w: _flac_lpc(w, sm, 2, 16, [3, -1], 4, 1)
    )
    assert _parse_flac(b) == (1, 8000, 16, [sum(sm)])
    # negative predictions exercise the arithmetic (not logical) shift
    neg = [-5, -7, -6, -9, -4, -8, -3, -2, -5, -7, -1, -6, -2, -4, -3, -8]
    b = b"fLaC" + _flac_streaminfo() + _flac_frame(
        lambda w: _flac_lpc(w, neg, 1, 16, [2], 4, 1)
    )
    assert _parse_flac(b) == (1, 8000, 16, [sum(neg)])
    # max order 32 with a 48-sample block
    sm32 = [rng.randint(-50, 50) for _ in range(48)]
    coef32 = [rng.randint(-8, 7) for _ in range(32)]
    b = b"fLaC" + _flac_streaminfo(bs=48, total=48) + _flac_frame(
        lambda w: _flac_lpc(w, sm32, 32, 16, coef32, 4, 5), bs=48
    )
    assert _parse_flac(b) == (1, 8000, 48, [sum(sm32)])

    def enc_bad_prec(w):
        w.w(0, 1); w.w(32, 6); w.w(0, 1)
        w.ws(0, 16)
        w.w(15, 4)  # precision code 0b1111: invalid

    def enc_neg_shift(w):
        w.w(0, 1); w.w(32, 6); w.w(0, 1)
        w.ws(0, 16)
        w.w(3, 4); w.w(0b11111, 5)  # shift -1: spec-forbidden

    for enc in (enc_bad_prec, enc_neg_shift):
        b = b"fLaC" + _flac_streaminfo() + _flac_frame(enc)
        assert _parse_flac(b) is None, enc.__name__


def test_parse_flac_rejects():
    """Honest rejects: reserved subframe types, corrupt frame
    CRC-8/CRC-16, >2 channels, truncated streams, bad sync, garbage."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_flac

    sm = list(range(16))
    good = b"fLaC" + _flac_streaminfo() + _flac_frame(
        lambda w: _flac_verbatim(w, sm, 16)
    )
    assert _parse_flac(good) == (1, 8000, 16, [sum(sm)])

    def enc_reserved(w):
        w.w(0, 1); w.w(0b000010, 6); w.w(0, 1)  # reserved subframe type

    assert _parse_flac(
        b"fLaC" + _flac_streaminfo() + _flac_frame(enc_reserved)
    ) is None
    crc16_bad = bytearray(good)
    crc16_bad[-1] ^= 1
    assert _parse_flac(bytes(crc16_bad)) is None
    crc8_bad = bytearray(good)
    crc8_bad[4 + 38 + 5] ^= 1  # the frame-header CRC-8 byte
    assert _parse_flac(bytes(crc8_bad)) is None
    assert _parse_flac(good[:-4]) is None  # truncated
    assert _parse_flac(b"fLaC" + _flac_streaminfo() + b"\x12\x34") is None
    assert _parse_flac(b"not flac") is None
    assert _parse_flac(b"fLaC") is None
    # a stream-coded sample rate of 0 (16-bit Hz field) must reject, not
    # divide-by-zero in the caller's duration math
    from woe_monotonic_binning_spark.operators.multimodal import _crc8, _crc16
    w = _FlacW()
    w.w(0x3FFE, 14); w.w(0, 2)
    w.w(6, 4); w.w(13, 4); w.w(0, 4); w.w(4, 3); w.w(0, 1)
    w.w(0, 8); w.w(15, 8); w.w(0, 16)  # blocksize-1=15, rate = 0 Hz
    hdr = w.out(); hdr += bytes([_crc8(hdr)])
    wb = _FlacW(); _flac_verbatim(wb, sm, 16)
    frame = hdr + wb.out()
    z = b"fLaC" + _flac_streaminfo() + frame + _crc16(frame).to_bytes(2, "big")
    assert _parse_flac(z) is None
    # 3 independent channels: beyond the 1-2 channel sum contract
    tri = b"fLaC" + _flac_streaminfo(nch=3) + _flac_frame(
        lambda w: (_flac_verbatim(w, sm, 16),) * 3, ch_code=2
    )
    assert _parse_flac(tri) is None


def test_synthetic_flac_media_certifies_decoder(spark):
    """JVM-built FLAC fixture end to end through decode_audio: CRC-gated
    constant-subframe frames decode to sum_pcm = 192 * (1000 + 37*(id%16))
    with fmt 'flac', and a corrupted CRC-16 rejects to the NULL row."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_audio,
        synthetic_flac_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(23)], "doc_id long")
    rows = {
        r.media_id: r for r in decode_audio(synthetic_flac_media(docs)).collect()
    }
    assert len(rows) == 23
    for mid, r in rows.items():
        v = 1000 + 37 * (mid % 16)
        assert (r.fmt, r.n_channels, r.sample_rate, r.n_frames,
                r.duration_ms, r.sum_pcm, r.sum_pcm_r) == (
            "flac", 1, 8000, 192, 24, 192 * v, None), mid
    corrupted = synthetic_flac_media(docs.limit(4)).withColumn(
        "content",
        F.overlay(F.col("content"), F.unhex(F.lit("aaaa")), F.length("content") - 1),
    )
    for r in decode_audio(corrupted).collect():
        assert r.fmt is None and r.sum_pcm is None


def test_synthetic_flac_lpc_media_certifies_decoder(spark):
    """JVM-built LPC fixture end to end: order-2 (2,-1) extrapolation of
    two equal warmups stays flat, so sum_pcm = 16 * (2000 + 41*(id%16));
    a flipped coefficient bit (without CRC repair) rejects at the
    checksum gate."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_audio,
        synthetic_flac_lpc_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    rows = {
        r.media_id: r
        for r in decode_audio(synthetic_flac_lpc_media(docs)).collect()
    }
    for mid, r in rows.items():
        v = 2000 + 41 * (mid % 16)
        assert (r.fmt, r.n_channels, r.sample_rate, r.n_frames,
                r.duration_ms, r.sum_pcm) == ("flac", 1, 8000, 16, 2, 16 * v), mid
    corrupt = synthetic_flac_lpc_media(docs.limit(3)).withColumn(
        "content", F.overlay(F.col("content"), F.unhex(F.lit("1f")), 56)
    )
    for r in decode_audio(corrupt).collect():
        assert r.fmt is None and r.sum_pcm is None


def test_probe_media_all_containers(spark):
    """probe_media (round 14): header-only container identification +
    metadata across every fixture family, plus rejects (garbage, NULL,
    truncated MP4, SOS-before-SOF JPEG) to the NULL-container row."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        probe_media,
        synthetic_avi_media,
        synthetic_flac_media,
        synthetic_jpeg_media,
        synthetic_mp4_media,
        synthetic_png_media,
        synthetic_ppm_media,
        synthetic_wav_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    expect = {
        "mp4": (synthetic_mp4_media,
                lambda m: ("mp4", 320, 240, None, None, 5000 + m % 97)),
        "avi": (synthetic_avi_media,
                lambda m: ("avi", 320, 240, None, None, 4000 + 40 * (m % 50))),
        "png": (synthetic_png_media, lambda m: ("png", 4, 2, None, None, None)),
        "jpeg": (synthetic_jpeg_media,
                 lambda m: ("jpeg", 16, 8, None, None, None)),
        "ppm": (synthetic_ppm_media, lambda m: ("ppm", 4, 2, None, None, None)),
        "wav": (synthetic_wav_media, lambda m: ("wav", None, None, 1, 8000, 1)),
        "flac": (synthetic_flac_media,
                 lambda m: ("flac", None, None, 1, 8000, 24)),
    }
    for name, (builder, exp) in expect.items():
        rows = {r.media_id: r for r in probe_media(builder(docs)).collect()}
        for m, r in rows.items():
            got = (r.container, r.width, r.height, r.n_channels,
                   r.sample_rate, r.duration_ms)
            assert got == exp(m), (name, m, got)
            assert r.n_bytes > 0
    bad = spark.createDataFrame(
        [
            (0, "video", bytearray(b"garbage bytes")),
            (1, "video", None),
            (2, "video", bytearray(b"\x00\x00\x00\x10ftypisom")),  # no moov
            (3, "image", bytearray(b"\xff\xd8\xff\xda\x00\x04ab")),  # SOS first
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in probe_media(bad).collect()}
    assert rows[0].container is None and rows[0].n_bytes == 13
    assert rows[1].container is None and rows[1].n_bytes is None
    # a moov-less but well-formed ftyp stream identifies as mp4 with
    # NULL metadata (honest partial probe)
    assert rows[2].container == "mp4" and rows[2].duration_ms is None
    assert rows[3].container is None


def test_jpeg_fill_bytes_tolerated_by_both_walks(spark):
    """The decoder and the header probe share ONE marker-advance step
    (_jpeg_scan_marker, round 15): a fill-byte run before a segment
    marker (T.81 B.1.1.2) must be tolerated by BOTH callers, and a
    corrupt non-marker byte rejected by both."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        _parse_jpeg,
        probe_media,
        synthetic_jpeg_media,
    )

    docs = spark.createDataFrame([(3,)], "doc_id long")
    base = bytes(synthetic_jpeg_media(docs).collect()[0].content)
    # inject a 3-byte 0xFF fill run right after SOI (before DQT)
    padded = base[:2] + b"\xff\xff\xff" + base[2:]
    assert _parse_jpeg(padded) is not None
    assert _parse_jpeg(padded)[:2] == (16, 8)
    df = spark.createDataFrame(
        [(0, "image", bytearray(padded)),
         (1, "image", bytearray(base[:2] + b"\x00" + base[2:]))],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in probe_media(df).collect()}
    assert (rows[0].container, rows[0].width, rows[0].height) == (
        "jpeg", 16, 8
    )
    # the corrupt byte rejects in the probe too, same as the decoder
    assert rows[1].container is None
    assert _parse_jpeg(bytes(base[:2] + b"\x00" + base[2:])) is None


def test_parse_flac_rejects_inconsistent_frame_rates():
    """ADVICE r15: per-frame sample-rate codes that resolve differently
    must reject (None) — a 'last frame wins' rate silently corrupts
    duration_ms downstream.  Codes that resolve to the SAME rate via
    different encodings (0 = STREAMINFO 8000 vs table code 4 = 8000)
    stay accepted."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_flac

    sm = list(range(-8, 8))
    f8000 = _flac_frame(lambda w: _flac_verbatim(w, sm, 16), rate_code=4)
    f16000 = _flac_frame(lambda w: _flac_verbatim(w, sm, 16), rate_code=5)
    f_si = _flac_frame(lambda w: _flac_verbatim(w, sm, 16), rate_code=0)
    si = _flac_streaminfo(total=32)
    assert _parse_flac(b"fLaC" + si + f8000 + f16000) is None
    assert _parse_flac(b"fLaC" + si + f8000 + f_si) == (
        1, 8000, 32, [2 * sum(sm)]
    )


def test_probe_avi_inner_scan_bounded_by_hdrl_extent():
    """ADVICE r15: _probe_avi's avih scan must stay inside the hdrl LIST
    — a spurious 'avih' fourcc in later chunk payloads (movi sample
    data) must not be misread as the header when the hdrl has no avih."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import _probe_avi

    # hdrl LIST containing only a junk chunk (no avih)
    junk = b"strl" + struct.pack("<I", 4) + b"\x00" * 4
    hdrl_body = b"hdrl" + junk
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_body)) + hdrl_body
    # movi payload that CONTAINS the bytes 'avih' + a plausible header —
    # 56 bytes of fake avih body claiming 999x888 dims
    fake = (b"avih" + struct.pack("<I", 56)
            + struct.pack("<IIIII", 1000, 0, 0, 0, 10)
            + struct.pack("<III", 0, 0, 0) + struct.pack("<II", 999, 888)
            + b"\x00" * 16)
    movi_body = b"movi" + b"00dc" + struct.pack("<I", len(fake)) + fake
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    riff_body = b"AVI " + hdrl + movi
    b = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    # honest partial probe: identifies as avi, reports NO dims/duration
    assert _probe_avi(b) == ("avi", None, None, None, None, None)
    # control: a real avih inside hdrl still parses
    real_body = b"hdrl" + fake
    real_hdrl = b"LIST" + struct.pack("<I", len(real_body)) + real_body
    rb = b"AVI " + real_hdrl + movi
    b2 = b"RIFF" + struct.pack("<I", len(rb)) + rb
    assert _probe_avi(b2) == ("avi", 999, 888, None, None, 10)


def test_decode_frames_mjpeg_avi(spark):
    """decode_frames (round 15): real MJPEG-in-AVI frame decode — one row
    per stored '00dc' chunk with the closed-form JPEG sums, avih-derived
    timestamps, honest rejects for NULL/non-AVI payloads and for video
    chunks the JPEG decoder cannot parse."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_frames,
        synthetic_avi_mjpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    rows = decode_frames(synthetic_avi_mjpeg_media(docs)).collect()
    assert len(rows) == 12  # 4 payloads x 3 frames
    for r in rows:
        exp = 64 * (257 + 2 * (16 + (r.media_id + r.frame_idx) % 16))
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("mjpeg", 16, 8, 128)
        assert r.ts_ms == 40 * r.frame_idx
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp, exp, exp)
    bad = spark.createDataFrame(
        [(0, "video", bytearray(b"not avi")), (1, "video", None)],
        "media_id long, kind string, content binary",
    )
    rej = {r.media_id: r for r in decode_frames(bad).collect()}
    assert len(rej) == 2
    for r in rej.values():
        assert r.frame_idx is None and r.fmt is None and r.sum_r is None


def test_avi_video_frames_walk_rec_lists_and_non_jpeg_chunks(spark):
    """_avi_video_frames descends one level into 'rec ' grouping LISTs
    and decode_frames downgrades a chunk _parse_jpeg rejects to a
    per-frame NULL-stats row (frame POSITION is a container fact, pixel
    stats need the codec)."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import (
        _avi_video_frames,
        decode_frames,
    )

    def chunk(cid, payload):
        return cid + struct.pack("<I", len(payload)) + payload + (
            b"\x00" if len(payload) & 1 else b""
        )

    avih = (b"avih" + struct.pack("<I", 56) + struct.pack("<I", 20000)
            + b"\x00" * 52)
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih)) + b"hdrl" + avih
    f0 = chunk(b"00dc", b"\x01\x02\x03")  # not a JPEG
    rec_body = b"rec " + chunk(b"00dc", b"\x04\x05")
    rec = b"LIST" + struct.pack("<I", len(rec_body)) + rec_body
    audio = chunk(b"01wb", b"\x00" * 6)  # audio chunk: skipped
    movi_body = b"movi" + f0 + rec + audio
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + hdrl + movi
    b = b"RIFF" + struct.pack("<I", len(body)) + body
    usec, frames = _avi_video_frames(b)
    assert usec == 20000
    assert frames == [b"\x01\x02\x03", b"\x04\x05"]
    df = spark.createDataFrame(
        [(7, "video", bytearray(b))],
        "media_id long, kind string, content binary",
    )
    rows = sorted(decode_frames(df).collect(), key=lambda r: r.frame_idx)
    assert [(r.frame_idx, r.ts_ms, r.fmt) for r in rows] == [
        (0, 0, None), (1, 20, None)
    ]


def test_sample_frames_decode_true_samples_covering_frame(spark):
    """sample_frames(decode=True): decodes ONLY the stored frame covering
    each sampled timestamp — at every_ms=80 over 3 frames of 40 ms that
    is frames 0 and 2; stats match decode_frames' rows for those
    indices; non-AVI payloads give the one NULL reject row; the default
    decode=False stub behavior is unchanged."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_frames,
        sample_frames,
        synthetic_avi_mjpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(3)], "doc_id long")
    media = synthetic_avi_mjpeg_media(docs)
    got = {
        (r.media_id, r.ts_ms): r
        for r in sample_frames(media, every_ms=80, decode=True).collect()
    }
    ref = {
        (r.media_id, r.frame_idx): r for r in decode_frames(media).collect()
    }
    assert len(got) == 6  # 3 payloads x ts {0, 80}
    for (mid, ts), r in got.items():
        assert r.frame_idx == (0 if ts == 0 else 2)
        expect = ref[(mid, r.frame_idx)]
        assert (r.sum_r, r.width, r.height) == (
            expect.sum_r, expect.width, expect.height
        )
    # stub path unchanged: metadata-driven timestamps only
    stub = sample_frames(media, every_ms=80).collect()
    assert {(r.media_id, r.frame_idx, r.ts_ms) for r in stub} == {
        (i, k, 80 * k) for i in range(3) for k in range(2)
    }


def test_decode_text_charsets(spark):
    """decode_text (round 15; cp1252 round 16): BOM-driven codec choice
    with the BOM stripped, strict UTF-8 first without one, the
    windows-1252 then latin-1 fallback chain, honest rejects for
    BOM-bearing bodies that do not decode, UTF-32 BOMs matched before
    their UTF-16 prefixes, NULL-in-NULL-out."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_text

    rows = [
        (0, "hey café".encode("utf-8")),
        (1, b"\xef\xbb\xbf" + "bom café".encode("utf-8")),
        (2, b"\xff\xfe" + "wide".encode("utf-16-le")),
        (3, b"\xfe\xff" + "wide".encode("utf-16-be")),
        (4, b"latin \xe9 end"),
        (5, b"\xff\xfeA"),  # UTF-16 BOM + odd body: reject
        (6, b"\xff\xfe\x00\x00" + "u32".encode("utf-32-le")),
        (7, b"\x00\x00\xfe\xff" + "u32".encode("utf-32-be")),
        (8, None),
        (9, b""),
    ]
    df = spark.createDataFrame(
        [(i, "text", bytearray(b) if b is not None else None) for i, b in rows],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in decode_text(df).collect()}
    exp = {
        0: ("hey café", "utf-8", False, 9),
        1: ("bom café", "utf-8", True, 12),
        2: ("wide", "utf-16-le", True, 10),
        3: ("wide", "utf-16-be", True, 10),
        # 0xE9 is é in BOTH cp1252 and latin-1; the cp1252 fallback
        # fires first (round 16) so the codec name changes, text doesn't
        4: ("latin é end", "windows-1252", False, 11),
        5: (None, None, True, 3),
        6: ("u32", "utf-32-le", True, 16),
        7: ("u32", "utf-32-be", True, 16),
        8: (None, None, None, None),
        9: ("", "utf-8", False, 0),
    }
    for i, e in exp.items():
        r = got[i]
        assert (r.text, r.encoding, r.had_bom, r.n_bytes) == e, (i, r)
    # strict mode: invalid UTF-8 without a BOM rejects instead of
    # falling back (both fallbacks off)
    strict = decode_text(
        df, latin1_fallback=False, cp1252_fallback=False
    ).collect()
    s4 = next(r for r in strict if r.media_id == 4)
    assert s4.text is None and s4.encoding is None


def test_decode_text_feeds_extract_html_text(spark):
    """The ingest chain the round-14 verdict asked for: bytes ->
    decode_text -> extract_html_text — a latin-1 HTML payload comes out
    as clean visible text."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_text
    from woe_monotonic_binning_spark.operators.text import extract_html_text

    payload = "<html><p>caf\xe9 &amp; more</p></html>".encode("latin-1")
    df = spark.createDataFrame(
        [(0, "text", bytearray(payload))],
        "media_id long, kind string, content binary",
    )
    out = extract_html_text(decode_text(df), html_col="text").collect()[0]
    # 0xE9 decodes identically under cp1252 (which now fronts the
    # fallback chain) and latin-1 — the codec NAME reflects round 16
    assert out.text == "café & more" and out.encoding == "windows-1252"


def test_decode_text_hints_and_cp1252(spark):
    """Round 16: charset hints (Content-Type or bare label, alias
    normalization, charset= extraction) beat the fallback chain but
    never a BOM; windows-1252 fronts the no-hint fallback and its five
    undefined bytes fall through to latin-1; lying/unknown hints
    degrade, never reject."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_text

    rows = [
        # curly quotes: cp1252 gives U+201C/U+201D, latin-1 would give C1
        (0, b"say \x93hi\x94", None),
        # 0x81 undefined in cp1252 -> latin-1 catches it
        (1, b"odd \x81 byte", None),
        # latin-1 hint over 0x93: hint honored, NOT conflated to cp1252
        (2, b"ctl \x93", "text/html; charset=ISO-8859-1"),
        # bare alias, charset= absent
        (3, "caf\xe9".encode("utf-8"), "UTF8"),
        # hint names cp1252 by alias
        (4, b"q \x93", "CP1252"),
        # lying hint (utf-16-le over odd bytes) falls through to utf-8
        (5, b"abc", "utf-16le"),
        # unknown label ignored entirely
        (6, b"plain", "klingon-8"),
        # BOM outranks a contradicting hint
        (7, b"\xef\xbb\xbf" + "bom".encode("utf-8"), "ISO-8859-1"),
    ]
    df = spark.createDataFrame(
        [(i, "text", bytearray(b), h) for i, b, h in rows],
        "media_id long, kind string, content binary, charset_hint string",
    )
    got = {
        r.media_id: r
        for r in decode_text(df, hint_col="charset_hint").collect()
    }
    exp = {
        0: ("say “hi”", "windows-1252"),
        1: ("odd \x81 byte", "latin-1"),
        2: ("ctl \x93", "latin-1"),
        3: ("café", "utf-8"),
        4: ("q “", "windows-1252"),
        5: ("abc", "utf-8"),
        6: ("plain", "utf-8"),
        7: ("bom", "utf-8"),
    }
    for i, e in exp.items():
        assert (got[i].text, got[i].encoding) == e, (i, got[i])
    assert got[7].had_bom is True and got[2].had_bom is False
    # without the hint column, row 2 decodes via the cp1252 fallback
    nohint = {r.media_id: r for r in decode_text(df).collect()}
    assert nohint[2].text == "ctl “"
    assert nohint[2].encoding == "windows-1252"


def test_decode_text_meta_prescan(spark):
    """Round 17: the WHATWG meta prescan — <meta charset=> /
    http-equiv inside the first 1024 bytes decides the codec when no
    BOM and no (recognized) transport hint; transport BEATS meta (the
    WHATWG order); a lying meta degrades; a meta past the 1024-byte
    prescan window is ignored; meta_sniff=False restores the round-16
    chain."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_text

    meta_l1 = b'<meta charset="iso-8859-1">m \x93'
    http_equiv = (
        b'<META HTTP-EQUIV="Content-Type" '
        b'CONTENT="text/html; charset=ISO-8859-1">h \x93'
    )
    far_meta = b"x" * 1100 + b'<meta charset="iso-8859-1"> far \x93'
    rows = [
        (0, meta_l1, None),                    # meta honored: U+0093
        (1, http_equiv, None),                 # case-insensitive form
        (2, meta_l1, "windows-1252"),          # transport beats meta
        (3, b'<meta charset="utf-8">lie \x93', None),  # lying meta
        (4, far_meta, None),                   # outside prescan window
        (5, b'<meta charset="x-unknown">u \x93', None),  # unknown label
        # BOM beats meta: utf-8 BOM + ascii body with a latin-1 meta
        (6, b"\xef\xbb\xbf" + b'<meta charset="iso-8859-1">bom', None),
    ]
    df = spark.createDataFrame(
        [(i, "text", bytearray(b), h) for i, b, h in rows],
        "media_id long, kind string, content binary, charset_hint string",
    )
    got = {
        r.media_id: r
        for r in decode_text(df, hint_col="charset_hint").collect()
    }
    assert got[0].text.endswith("m \x93") and got[0].encoding == "latin-1"
    assert got[1].text.endswith("h \x93") and got[1].encoding == "latin-1"
    assert got[2].text.endswith("m “")
    assert got[2].encoding == "windows-1252"
    assert got[3].text.endswith("lie “")
    assert got[3].encoding == "windows-1252"
    assert got[4].text.endswith("far “")
    assert got[4].encoding == "windows-1252"
    assert got[5].text.endswith("u “")
    assert got[5].encoding == "windows-1252"
    assert got[6].encoding == "utf-8" and got[6].had_bom is True
    # meta_sniff=False: row 0 falls back to cp1252 like round 16
    off = {
        r.media_id: r
        for r in decode_text(
            df, hint_col="charset_hint", meta_sniff=False
        ).collect()
    }
    assert off[0].text.endswith("m “")
    assert off[0].encoding == "windows-1252"


def test_decode_audio_wav_real_samples(spark):
    """decode_audio is a REAL RIFF/WAV PCM16 decoder (round 11): a
    stereo fixture written by stdlib ``wave`` (a third-party encoder
    sharing no code with the parser) decodes to exact per-channel sums;
    the JVM-built mono fixture matches its formula; compressed/8-bit/
    truncated payloads fall through to the NULL-fmt reject row."""
    import io
    import struct
    import wave

    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_audio,
        synthetic_wav_media,
    )

    samples = [(100, -50), (-32768, 32767), (0, 7), (1234, -999)]
    buf = io.BytesIO()
    wv = wave.open(buf, "wb")
    wv.setnchannels(2)
    wv.setsampwidth(2)
    wv.setframerate(44100)
    wv.writeframes(b"".join(struct.pack("<hh", a, b) for a, b in samples))
    wv.close()
    good = buf.getvalue()
    bad_bits = bytearray(good)
    bad_bits[34] = 8  # 8-bit PCM: unsupported, must reject not mis-sum
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(good)),
            (2, "audio", bytearray(bad_bits)),
            (3, "audio", bytearray(good[:40])),  # truncated
            (4, "audio", None),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_audio(media).collect()}
    r = rows[1]
    assert (r.fmt, r.n_channels, r.sample_rate, r.n_frames) == ("wav", 2, 44100, 4)
    assert r.duration_ms == 4 * 1000 // 44100 == 0
    assert r.sum_pcm == sum(a for a, _ in samples)
    assert r.sum_pcm_r == sum(b for _, b in samples)
    for mid in (2, 3, 4):
        assert rows[mid].fmt is None and rows[mid].sum_pcm is None

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(32)
    out = {r.media_id: r for r in decode_audio(synthetic_wav_media(docs)).collect()}
    assert len(out) == 32
    for mid, r in out.items():
        assert (r.fmt, r.n_channels, r.sample_rate, r.n_frames) == ("wav", 1, 8000, 8)
        assert r.duration_ms == 1 and r.sum_pcm_r is None
        assert r.sum_pcm == 8 * (mid % 20000)


def test_resize_image_nearest_golden(spark):
    """resize_image (round 11): nearest-neighbor 2x2 checkerboard -> 4x4
    block expansion, hand-pinned through a decode_image round-trip of the
    re-encoded P6 output; downscale picks floor-index pixels; unparseable
    payloads yield NULL content."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        resize_image,
    )

    pix = [
        [(255, 0, 0), (0, 255, 0)],
        [(0, 0, 255), (10, 20, 30)],
    ]
    flat = [c for row in pix for p in row for c in p]
    ppm = b"P6\n2 2\n255\n" + bytes(flat)
    media = spark.createDataFrame(
        [(1, "image", bytearray(ppm)), (2, "image", bytearray(b"garbage"))],
        "media_id long, kind string, content binary",
    )
    up = {r.media_id: r for r in resize_image(media, 4, 4).collect()}
    assert up[1].fmt == "ppm" and (up[1].width, up[1].height) == (4, 4)
    assert up[2].fmt is None and up[2].content is None
    # each source pixel becomes a 2x2 block: sums scale exactly 4x
    dec = decode_image(
        spark.createDataFrame(
            [(1, "image", bytearray(bytes(up[1].content)))],
            "media_id long, kind string, content binary",
        )
    ).collect()[0]
    assert (dec.width, dec.height, dec.n_pixels) == (4, 4, 16)
    assert (dec.sum_r, dec.sum_g, dec.sum_b) == (
        4 * (255 + 0 + 0 + 10), 4 * (0 + 255 + 0 + 20), 4 * (0 + 0 + 255 + 30),
    )
    # the raster itself is the block expansion, not just the sums: check
    # one row layout via the decoded byte order of the re-encoded P6
    body = bytes(up[1].content).split(b"255\n", 1)[1]
    assert body[0:3] == bytes((255, 0, 0)) and body[9:12] == bytes((0, 255, 0))
    # downscale 2x2 -> 1x1 keeps the floor-index (top-left) pixel
    down = {r.media_id: r for r in resize_image(media, 1, 1).collect()}[1]
    dbody = bytes(down.content).split(b"255\n", 1)[1]
    assert dbody == bytes((255, 0, 0))


def test_lang_id_deterministic(spark):
    from woe_monotonic_binning_spark.operators.text import detect_language

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = detect_language(docs).groupBy("lang_pred").count().collect()
    b = detect_language(docs).groupBy("lang_pred").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_quantize_summary_caps_distincts_and_preserves_moments(spark):
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.fit import melt_features, quantize_summary, summarize

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("double")
    )
    # l_extendedprice: thousands of distincts; l_discount: 11 (under the cap)
    summary = summarize(melt_features(li, "target", ["l_extendedprice", "l_discount"]))
    capped = quantize_summary(summary, 64).cache()

    per_var = {
        r["variable"]: r
        for r in capped.groupBy("variable")
        .agg(
            F.count("*").alias("k"),
            F.sum("size").alias("size"),
            F.sum("bads").alias("bads"),
            F.sum("sumsq").alias("sumsq"),
        )
        .collect()
    }
    orig = {
        r["variable"]: r
        for r in summary.groupBy("variable")
        .agg(
            F.count("*").alias("k"),
            F.sum("size").alias("size"),
            F.sum("bads").alias("bads"),
            F.sum("sumsq").alias("sumsq"),
        )
        .collect()
    }
    # distinct counts capped; under-cap variables untouched
    assert per_var["l_extendedprice"]["k"] <= 64
    assert per_var["l_discount"]["k"] == orig["l_discount"]["k"]
    # moments are EXACTLY preserved (re-aggregated, not approximated)
    for v in per_var:
        for m in ("size", "bads", "sumsq"):
            assert per_var[v][m] == pytest.approx(orig[v][m], abs=1e-9), (v, m)
    # bucket representative = min value of the bucket: all values exist in the input
    vals = {r["value"] for r in capped.filter(F.col("variable") == "l_extendedprice").collect()}
    src = {r["value"] for r in summary.filter(F.col("variable") == "l_extendedprice").collect()}
    assert vals <= src
    # equal-frequency: largest bucket bounded by ~2x the ideal share + max group
    sizes = [r["size"] for r in capped.filter(F.col("variable") == "l_extendedprice").collect()]
    total = sum(sizes)
    max_group = max(
        r["size"] for r in summary.filter(F.col("variable") == "l_extendedprice").collect()
    )
    assert max(sizes) <= 2 * total / 64 + max_group


def test_quantized_fit_invariant_to_input_partitioning(spark):
    """A ``max_distinct`` fit must produce the SAME bins table no matter how
    the input happens to be partitioned — pins the determinism bug class
    where summation order inside the distributed prefix sum flips a value
    across a bucket edge (observed as a 2->1 bin drift between rounds)."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import fit_bins

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_extendedprice", "l_quantity"]

    def bins_rows(df):
        out = fit_bins(df, "target", cols, n_threshold=100, max_distinct=200)
        return sorted(
            (tuple(None if v is None else round(v, 9) if isinstance(v, float) else v for v in r))
            for r in out.collect()
        )

    baseline = bins_rows(li.repartition(1))
    for n in (8, 32):
        assert bins_rows(li.repartition(n)) == baseline, f"drift at repartition({n})"


def test_max_distinct_auto_resolves_to_constant(spark):
    """``max_distinct="auto"`` is exactly the AUTO_MAX_DISTINCT explicit fit
    (per-variable guard: under-cap variables are untouched, so on narrow
    data "auto" is also bin-identical to the uncapped fit)."""
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark import fit_bins
    from woe_monotonic_binning_spark.fit import AUTO_MAX_DISTINCT

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").withColumn(
        "target", (F.col("l_returnflag") == "R").cast("double")
    )
    cols = ["l_extendedprice", "l_discount"]

    def rows(md):
        out = fit_bins(li, "target", cols, n_threshold=100, max_distinct=md)
        return sorted(
            tuple(None if v is None else round(v, 9) if isinstance(v, float) else v for v in r)
            for r in out.collect()
        )

    auto = rows("auto")
    assert auto == rows(AUTO_MAX_DISTINCT)
    assert auto == rows(None)  # sf0.001 distincts < cap -> guard is a no-op


def test_media_feature_extraction_composes_with_similarity(spark):
    from pyspark.sql import functions as F

    from woe_monotonic_binning_spark.operators.multimodal import (
        extract_features,
        media_from_documents,
        resize_media,
    )
    from woe_monotonic_binning_spark.operators.similarity import brute_force_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    media = media_from_documents(docs)
    feats = extract_features(media, dim=8).cache()
    assert feats.count() == docs.count()
    # deterministic: two runs produce identical vectors
    again = {r["media_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    for r in feats.collect():
        assert again[r["media_id"]] == r["feature"]
        norm = sum(x * x for x in r["feature"]) ** 0.5
        assert norm == pytest.approx(1.0, abs=1e-9) or norm == 0.0
    # composes with the similarity operators unchanged
    emb = feats.select(F.col("media_id").alias("vec_id"), F.col("feature").alias("embedding"))
    top = brute_force_topk(emb, emb.limit(3), k=5)
    assert top.groupBy("query_id").count().filter("count != 5").count() == 0

    resized = resize_media(media, 224, 224)
    row = resized.select("meta.width", "meta.height", "meta.mime").first()
    assert (row["width"], row["height"]) == (224, 224)
    assert row["mime"] == "application/x-fake-resized"
    assert resized.count() == docs.count()


def test_winnowing_fingerprints_detect_local_overlap(spark):
    from woe_monotonic_binning_spark.operators.text import (
        winnow_fingerprints,
        winnow_match_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " with a small tail appended"),          # near-dup of 1
            (3, "completely different text about spark plans and shuffles"),
            (4, "unrelated words entirely zebra quantum flux capacitor"),
        ],
        "doc_id bigint, text string",
    )
    fp = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_fingerprints(docs).collect()}
    # deterministic across runs
    fp2 = {r["doc_id"]: set(r["fingerprints"]) for r in winnow_fingerprints(docs).collect()}
    assert fp == fp2
    # a shared prefix shares most fingerprints; unrelated docs share ~none
    assert len(fp[1] & fp[2]) >= 0.7 * len(fp[1])
    assert len(fp[1] & fp[3]) <= 2
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnow_match_pairs(docs, min_shared=3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (3, 4) not in pairs


def test_srp_lsh_recall_and_plan_shape(spark):
    from woe_monotonic_binning_spark.operators.similarity import (
        brute_force_topk,
        srp_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 10)
    approx = srp_topk(emb, queries, k=5, n_bits=64, n_bands=16)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(truth & got) / len(truth)
    # fixed seed + fixed data => deterministic; measured 0.98 at 64/16
    assert recall >= 0.9, f"SRP recall {recall:.2f} below target"
    # every reported cosine must be the exact one (re-ranking is exact)
    exact_cos = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(emb, queries, k=500).collect()
    }
    for r in approx.collect():
        assert abs(exact_cos[(r.query_id, r.neighbor_id)] - r.cosine) < 1e-9
    # plan shape: query side of the band join is broadcast, corpus side
    # carries no shuffle before the join
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    emb.unpersist()


def test_salted_join_matches_plain_join_under_skew(spark):
    from woe_monotonic_binning_spark.operators.joins import salted_join

    # 90%-hot-key fact against a 3-row dim
    fact = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 3).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c")], "k int, name string")

    plain = fact.join(dim, "k").groupBy("k", "name").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    salted = salted_join(fact, dim, "k", n_salts=8).groupBy("k", "name").agg(
        F.count("*").alias("n"), F.sum("payload").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))

    # left join keeps unmatched fact rows exactly once
    dim_missing = dim.filter(F.col("k") != 1)  # hot key now unmatched
    left = salted_join(fact, dim_missing, "k", n_salts=8, how="left")
    assert left.count() == fact.count()
    assert left.filter(F.col("k") == 1).filter(F.col("name").isNotNull()).count() == 0

    import pytest

    with pytest.raises(ValueError):
        salted_join(fact, dim, "k", how="full")


def test_srp_threshold_pairs_recall_and_exact_refilter(spark):
    from woe_monotonic_binning_spark.functions.vector import cosine_similarity
    from woe_monotonic_binning_spark.operators.similarity import srp_threshold_pairs

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(cosine_similarity(F.col("v_a"), F.col("v_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
        .collect()
    }
    got = {(r.id_a, r.id_b) for r in srp_threshold_pairs(emb, threshold=0.35).collect()}
    assert exact, "ground truth should be non-empty at this threshold"
    # exact re-filter => no false positives; banding => high recall
    assert got <= exact
    assert len(got & exact) / len(exact) >= 0.85
    # a pathological bucket cap must degrade, never error
    capped = srp_threshold_pairs(emb, threshold=0.35, max_bucket=2)
    assert capped.count() <= len(got)
    emb.unpersist()


def test_srp_bucket_cap_degrades_to_star_not_drop(spark):
    """SRP twin of the MinHash/SimHash star-fallback guarantee (round 9):
    a constant-embedding spam cluster larger than max_bucket shares every
    band bucket, so pre-fix the cap DROPPED all its buckets and the
    cluster escaped embedding near-dup entirely.  Now each over-cap bucket
    emits O(k) anchor-star candidates (exact-cosine verified), so the
    cluster stays one connected component at linear pair cost."""
    from woe_monotonic_binning_spark.operators.similarity import srp_threshold_pairs

    k = 24
    hot_vec = [1.0, 2.0, -1.0, 0.5]
    rows = [(i, hot_vec) for i in range(k)]
    # background vectors, mutually dissimilar from the hot cluster
    rows += [
        (1000, [-1.0, 0.3, 2.0, -0.7]),
        (1001, [0.2, -2.0, 0.1, 1.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = srp_threshold_pairs(
        emb, threshold=0.99, n_bits=32, n_bands=8, max_bucket=k - 4
    )
    got = {(r.id_a, r.id_b): r.cosine for r in pairs.collect()}
    cluster_pairs = {p for p in got if p[0] < 1000 and p[1] < 1000}
    # exactly the star around the min-id anchor — pre-round-9 drop
    # semantics produced the EMPTY set here
    assert cluster_pairs == {(0, i) for i in range(1, k)}
    assert all(got[p] == 1.0 for p in cluster_pairs)


def test_srp_bits_for_threshold_adaptive_defaults():
    """Round-11 default: bits-per-band derive from the threshold via the
    banding OR-curve inversion (recall >= 0.9 at the threshold, maximal
    pruning).  Pins the published values — in particular that loose
    thresholds reproduce the old fixed default (4 bits/band), so every
    pre-round-11 call at t <= ~0.55 is bit-identical."""
    from woe_monotonic_binning_spark.operators.similarity import (
        srp_bits_for_threshold,
    )

    assert srp_bits_for_threshold(0.35) == 4  # == the old fixed default
    assert srp_bits_for_threshold(0.5) == 4
    assert srp_bits_for_threshold(0.8) == 8
    assert srp_bits_for_threshold(0.9) == 12
    assert srp_bits_for_threshold(0.95) == 18
    assert srp_bits_for_threshold(0.99) == 24  # clamped
    assert srp_bits_for_threshold(1.0) == 24
    assert srp_bits_for_threshold(-1.0) == 1
    # monotone in the threshold: tighter thresholds can only prune harder
    grid = [srp_bits_for_threshold(t / 20) for t in range(-20, 21)]
    assert grid == sorted(grid)


def test_srp_threshold_pairs_adaptive_default_finds_planted_dups(spark):
    """At a near-dup threshold the adaptive default (12 bits/band at
    t=0.9) must still find planted scaled-copy pairs (identical band
    signatures -> deterministic recall), while healthy random vectors
    stay unpaired; and the round-11 unified max_bucket=1_000 default
    star-degrades (never errors on) an over-cap spam cluster."""
    import random

    from woe_monotonic_binning_spark.operators.similarity import (
        srp_threshold_pairs,
    )

    rnd = random.Random(11)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(8)]) for i in range(50)]
    rows += [(100, [1.0, 2.0, 0.0, -1.0, 0.5, 0.0, 0.0, 1.0]),
             (101, [2.0, 4.0, 0.0, -2.0, 1.0, 0.0, 0.0, 2.0])]  # scaled copy
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in srp_threshold_pairs(emb, threshold=0.9).collect()}
    assert (100, 101) in got
    # precision 1.0: every returned pair is in the exact answer
    from woe_monotonic_binning_spark.functions.vector import cosine_similarity

    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("v_a"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("v_b"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.round(cosine_similarity(F.col("v_a"), F.col("v_b")), 6) >= 0.9)
        .collect()
    }
    assert got <= exact


def test_embedding_neardup_max_block_star_fallback(spark):
    """embedding_neardup_pairs with max_block: an over-cap block degrades
    to anchor-star candidates; under-cap blocks stay exact all-pairs;
    max_block=None opts back into the SQL-oracle-exact quadratic
    semantics (the library default is the CAPPED path since round 10,
    but under-cap blocks like these behave identically either way)."""
    from woe_monotonic_binning_spark.operators.dedup import embedding_neardup_pairs

    k = 10
    hot_vec = [1.0, 0.0, 1.0]
    rows = [(i, hot_vec, "hot") for i in range(k)]
    rows += [(100, [0.0, 1.0, 0.0], "cold"), (101, [0.0, 1.0, 0.0], "cold"),
             (102, [0.0, 1.0, 0.001], "cold")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, blk string")

    capped = embedding_neardup_pairs(
        df, "embedding", "vec_id", "blk", 0.9, max_block=k - 1
    )
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    hot_pairs = {p for p in got if p[0] < 100}
    cold_pairs = {p for p in got if p[0] >= 100}
    assert hot_pairs == {(0, i) for i in range(1, k)}  # star only
    assert cold_pairs == {(100, 101), (100, 102), (101, 102)}  # exact all-pairs

    exact = embedding_neardup_pairs(
        df, "embedding", "vec_id", "blk", 0.9, max_block=None
    )
    assert exact.count() == k * (k - 1) // 2 + 3  # None = exact quadratic
    # the round-10 capped DEFAULT (1_000) is identical on under-cap blocks
    dflt = embedding_neardup_pairs(df, "embedding", "vec_id", "blk", 0.9)
    assert dflt.count() == exact.count()


def test_embedding_neardup_default_is_capped(spark):
    """Round-10 default flip: a block over the library-default cap
    (1_000) emits ONLY the anchor star under the default call — the
    uncapped quadratic is opt-in via max_block=None.  Pins the fix for
    the round-9 verdict's one `weak` (uncapped within-block self-join on
    a hot semantic cluster, measured 12x wall at sf1)."""
    from woe_monotonic_binning_spark.operators.dedup import embedding_neardup_pairs

    import warnings as _w

    k = 1_001  # one over the default cap
    rows = [(i, [1.0, 0.0], "hot") for i in range(k)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, blk string")
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        got = embedding_neardup_pairs(df, "embedding", "vec_id", "blk", 0.9)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    assert pairs == {(0, i) for i in range(1, k)}  # star, not k*(k-1)/2
    # round-10 advice: the DEFAULT cap truncating a block must warn at
    # call time so the default flip can't silently reduce recall...
    warning = next(
        w for w in caught
        if issubclass(w.category, RuntimeWarning) and "max_block" in str(w.message)
    )
    # ...pointing at THIS file (the caller), not at dedup.py internals
    # (round-11 advice: stacklevel threads through the wrapper chain)
    assert warning.filename == __file__
    # round-11 advice: on the default path the (blk, count) probe table is
    # checkpointed once and shared, so the returned plan reads the
    # materialized RDD instead of re-running df's upstream lineage for
    # the ok/hot branches (visible as an ExistingRDD scan in the plan)
    assert "ExistingRDD" in got._jdf.queryExecution().executedPlan().toString()
    # ...while an EXPLICIT cap (even the same value) is an opt-in and
    # stays silent
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        explicit = embedding_neardup_pairs(
            df, "embedding", "vec_id", "blk", 0.9, max_block=1_000
        )
        assert {(r.id_a, r.id_b) for r in explicit.collect()} == pairs
    assert not [w for w in caught if issubclass(w.category, RuntimeWarning)]


def test_semantic_dedup_max_block_preserves_collapse(spark):
    """semantic_dedup(max_block=...): a hot semantic cluster bigger than
    max_block still collapses to ONE survivor through the anchor star."""
    import random

    from woe_monotonic_binning_spark.operators.dedup import semantic_dedup

    rnd = random.Random(7)
    k = 12
    hot = [1.0, 1.0, 0.0, 0.5]
    rows = [(i, hot) for i in range(k)]
    rows += [(200 + j, [rnd.uniform(-1, 1) for _ in range(4)]) for j in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, n_cells=3, threshold=0.999999, max_block=k - 2)
    kept = {r.vec_id for r in out.collect()}
    assert len(kept & set(range(k))) == 1  # hot cluster -> one survivor
    assert kept & set(range(k)) == {0}  # min-id canonical through the anchor


def test_srp_topk_default_params_recall_floor(spark):
    """Recall telemetry at srp_topk's DEFAULTS (32 bits / 8 bands): the
    docstring claims recall@5 ~ 0.7 on the near-random driver embeddings;
    this pins a >= 0.6 floor so band/bit tuning regressions surface in CI
    (the 64/16 high-recall configuration is pinned separately above)."""
    from woe_monotonic_binning_spark.operators.similarity import (
        brute_force_topk,
        srp_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .cache()
    )
    queries = emb.filter(F.col("vec_id") < 10)
    truth = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()}
    got = {(r.query_id, r.neighbor_id) for r in srp_topk(emb, queries, k=5).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, f"srp_topk default-config recall {recall:.2f} below floor"
    emb.unpersist()


def test_dedup_keep_best_null_order_values_lose(spark):
    """A doc with a NULL order value must never win its cluster, in either
    sort direction (round-5 ADVICE: bare asc() put NULLs FIRST, so a doc
    with a missing quality score beat every real value)."""
    from woe_monotonic_binning_spark.operators.dedup import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 1.0)], "doc_id int, quality double"
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a int, id_b int")
    best_desc = dedup_keep_best(docs, pairs, "doc_id", "quality", descending=True)
    assert [r.doc_id for r in best_desc.collect()] == [1]
    best_asc = dedup_keep_best(docs, pairs, "doc_id", "quality", descending=False)
    assert [r.doc_id for r in best_asc.collect()] == [3]


def test_salted_join_salt_is_partitioning_invariant(spark):
    """The salt must be a pure function of row content (xxhash64), not
    F.rand(): task retries and layout changes re-salt rand() rows
    differently.  Same stance as sampling.hash_uniform — identical results
    row-for-row under any repartitioning."""
    from woe_monotonic_binning_spark.operators.joins import salted_join

    fact = spark.range(0, 2_000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("payload")
    )
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(5)], "k bigint, name string"
    )
    base = sorted(map(tuple, salted_join(fact, dim, "k", n_salts=8).collect()))
    for layout in (fact.repartition(13), fact.coalesce(1), fact.repartition(3, "k")):
        again = sorted(map(tuple, salted_join(layout, dim, "k", n_salts=8).collect()))
        assert again == base


def test_pipelines_leave_no_sql_cache_entries(spark):
    """Cache lifecycle contract (round-5 judge): a full near-dup pipeline —
    minhash pairs -> connected components -> keep-best — plus the simhash,
    SRP and winnowing pair generators must leave the SQL cache EMPTY when
    they return: every internal persist() is released by
    _cache.materialize_and_release after the eager materialization, so a
    long-lived session looping over corpora accumulates no storage."""
    from woe_monotonic_binning_spark.operators.dedup import (
        decontaminate,
        dedup_keep_best,
        minhash_dedup_pairs,
        simhash_near_pairs,
    )
    from woe_monotonic_binning_spark.operators.similarity import srp_threshold_pairs
    from woe_monotonic_binning_spark.operators.text import winnow_match_pairs

    # The session-scoped fixtures hold caches of their own; drop everything
    # first so the final isEmpty() assertion is attributable to the
    # pipelines under test (fixtures re-materialize lazily, tests stay
    # correct — they just recompute).
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty()

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5)
    scored = docs.withColumn("q", F.length("text").cast("double"))
    assert dedup_keep_best(scored, pairs, "doc_id", "q").count() >= 0
    assert simhash_near_pairs(docs, "text", "doc_id").count() >= 0
    assert winnow_match_pairs(docs, min_shared=3).count() >= 0
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    assert srp_threshold_pairs(emb, threshold=0.35).count() >= 0
    assert decontaminate(docs, docs.filter(F.col("doc_id") % 50 == 0), n=8).count() >= 0
    assert cm.isEmpty(), "a pipeline left cached entries behind"

    # opt-out: cleanup=False returns the lazy plan and the caller owns the
    # cache lifecycle (the documented composition escape hatch)
    lazy = minhash_dedup_pairs(docs, "text", "doc_id", threshold=0.5, cleanup=False)
    assert lazy.count() >= 0
    assert not cm.isEmpty()
    spark.catalog.clearCache()


# ---------------------------------------------------------------------------
# semantic_dedup (SemDeDup composition)


def test_semantic_dedup_collapses_planted_duplicate_vectors(spark):
    """Clones of the first 5 vectors (new ids, identical embeddings) must
    collapse onto their originals — an identical vector lands in the same
    cell and pairs at cosine 1 — while at threshold ~1 nothing else pairs;
    min-id canonical keeps the original."""
    from woe_monotonic_binning_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding")
    )
    clones = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    corpus = emb.unionByName(clones)
    out = semantic_dedup(corpus, n_cells=4, threshold=0.999999)
    ids = {r.vec_id for r in out.select("vec_id").collect()}
    assert out.count() == emb.count()
    for i in range(5):
        assert i in ids and i + 100_000 not in ids


def test_semantic_dedup_keep_best_policy_and_stability(spark):
    """With an order column the BEST clone wins (here the planted copy
    carries the higher score), and the selection is identical after
    repartitioning (centroid seeding is id-ordered, not layout-ordered)."""
    from woe_monotonic_binning_spark.operators.dedup import semantic_dedup

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .withColumn("embedding", F.col("embedding").cast("array<double>"))
        .select("vec_id", "embedding")
    )
    clones = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 100_000
    )
    corpus = emb.unionByName(clones).withColumn(
        "score", F.when(F.col("vec_id") >= 100_000, 2.0).otherwise(1.0)
    )
    out = semantic_dedup(
        corpus, n_cells=4, threshold=0.999999, order_col="score"
    )
    ids = {r.vec_id for r in out.select("vec_id").collect()}
    for i in range(5):
        assert i + 100_000 in ids and i not in ids

    again = semantic_dedup(
        corpus.repartition(13), n_cells=4, threshold=0.999999, order_col="score"
    )
    assert {r.vec_id for r in again.select("vec_id").collect()} == ids


def test_semantic_dedup_multi_probe_catches_cross_cell_pair(spark):
    """A planted near-identical pair straddling the boundary between two
    cells: single-probe assignment (pair_probes=1) provably puts the two
    vectors in DIFFERENT cells, so the pair is never generated and both
    survive; top-2 probing (the default) blocks each vector on both cells
    and collapses the pair (round-7 VERDICT item 4).

    Geometry: 2 cells seeded at [1,0] / [0,1] (lowest-id vectors), filler
    vectors near each axis, and the dup pair at ~45° tilted a hair toward
    opposite axes — each member's nearest centroid differs, its
    second-nearest is the other's."""
    from woe_monotonic_binning_spark.operators.dedup import semantic_dedup

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (4, [0.1, 0.9]),
        (6, [0.72, 0.69]),  # dup pair, cosine ~0.9991; every other pair < 0.994
        (7, [0.69, 0.72]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    single = semantic_dedup(emb, n_cells=2, threshold=0.995, pair_probes=1)
    single_ids = {r.vec_id for r in single.select("vec_id").collect()}
    assert {6, 7} <= single_ids  # the documented single-probe miss

    multi = semantic_dedup(emb, n_cells=2, threshold=0.995)  # pair_probes=2
    multi_ids = {r.vec_id for r in multi.select("vec_id").collect()}
    assert 6 in multi_ids and 7 not in multi_ids  # min-id canonical
    # nothing else was over-merged: all other vectors survive
    assert multi_ids == {0, 1, 2, 4, 6}


def test_semi_pruned_join_rejects_prune_unsafe_modes(spark):
    """Round-8 review: pruning before a left join removes exactly the rows
    it must keep (NULL-extended), and before a left_anti removes the rows
    it must return — both must be loud errors, not silent corruption."""
    import pytest

    from woe_monotonic_binning_spark.operators.joins import semi_pruned_join

    fact = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    dim = spark.createDataFrame([(1, "x")], "k long, d string")
    with pytest.raises(ValueError, match="semi_pruned_join"):
        semi_pruned_join(fact, dim, "k", how="left")
    with pytest.raises(ValueError, match="semi_pruned_join"):
        semi_pruned_join(fact, dim, "k", how="left_anti")
    assert semi_pruned_join(fact, dim, "k").count() == 1  # inner still fine


def test_star_join_drops_redundant_dim_key(spark):
    """Round-8 review: the dim-side key is redundant after the equi-join
    and, when its name equals the fact FK, made every later by-name
    reference ambiguous."""
    from woe_monotonic_binning_spark.operators.joins import star_join

    fact = spark.createDataFrame([(1, 10.0), (2, 20.0), (3, 5.0)], "custkey long, amt double")
    dim = spark.createDataFrame([(1, "GOLD"), (2, "SILVER")], "custkey long, tier string")
    out = star_join(fact, {"custkey": (dim, "custkey")})
    assert out.columns.count("custkey") == 1  # no duplicate column
    rows = {r.custkey: r.tier for r in out.select("custkey", "tier").collect()}
    assert rows == {1: "GOLD", 2: "SILVER", 3: None}  # left semantics kept


def test_asof_join_accepts_epoch_right_ts(spark):
    """Round-8 review: a bigint epoch right_ts made the union's payload
    struct types incompatible (__ts:timestamp vs __ts:bigint)."""
    from woe_monotonic_binning_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    import datetime

    ts = int(datetime.datetime(2024, 1, 1, 9, 0, tzinfo=datetime.timezone.utc).timestamp())
    right = spark.createDataFrame(
        [(1, ts, "early"), (1, ts + 7200, "late")], "k long, rts long, tag string"
    )
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert len(out) == 1
    assert out[0]["tag"] == "early"  # 09:00 <= 10:00 < 11:00


def test_pack_sequences_null_tokens_and_bad_shards_are_loud(spark):
    """Round-8 review: a NULL token count used to kill the packing stage
    with int(NaN) deep inside pandas; n_shards <= 0 reached pmod(x, 0)."""
    import pytest

    from woe_monotonic_binning_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, 100), (2, None), (3, 50)], "doc_id long, stat_tokens long"
    )
    with pytest.raises(Exception, match="NULL|not castable"):
        pack_sequences(docs, budget=512).count()
    with pytest.raises(ValueError, match="n_shards"):
        pack_sequences(docs.na.drop(), budget=512, n_shards=0)
    ok = pack_sequences(docs.na.drop(), budget=512)
    assert ok.count() == 2


def test_zero_norm_embedding_excluded_not_rank_one(spark):
    """Round-8 review: cosine 0/0 gave NaN, which Spark ranks ABOVE every
    real cosine — an all-zero embedding surfaced as the rank-1 neighbor of
    every query and passed >= threshold filters.  try_divide yields NULL:
    sorted last, fails every threshold."""
    from woe_monotonic_binning_spark.operators.similarity import brute_force_topk

    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.0, 0.0]),  # degenerate
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = brute_force_topk(emb, emb.filter(F.col("vec_id") == 1), k=2).collect()
    ranks = {r.rank: r.neighbor_id for r in out}
    assert ranks[1] == 2  # the real neighbor, not the zero vector
    zero_rows = [r for r in out if r.neighbor_id == 3]
    assert all(r.cosine is None for r in zero_rows)


def test_srp_band_parameters_validated(spark):
    """Round-8 review: a non-dividing n_bands silently dropped trailing
    hyperplane bits; n_bands > n_bits crashed with an unrelated
    AttributeError.  Both are loud ValueErrors now; empty corpora get a
    clear dim-inference error."""
    import pytest

    from woe_monotonic_binning_spark.operators.similarity import srp_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divide"):
        srp_topk(emb, emb, k=1, n_bits=32, n_bands=6)
    with pytest.raises(ValueError, match="divide"):
        srp_topk(emb, emb, k=1, n_bits=8, n_bands=16)
    empty = emb.filter(F.col("vec_id") < 0)
    with pytest.raises(ValueError, match="dim"):
        srp_topk(empty, emb, k=1)


def test_event_rollup_grouping_id_disambiguates_null_keys(spark):
    """Round-8 review: a subtotal row's NULL event_type was byte-identical
    to a genuine NULL event_type data row; grouping_id tells them apart."""
    from woe_monotonic_binning_spark.operators.windows import event_rollup

    rows = [
        (None, "2024-01-01 10:00:00", 1.0),
        ("click", "2024-01-01 11:00:00", 2.0),
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = event_rollup(ev).collect()
    data_null = [
        r for r in out if r.event_type is None and r.day is not None and r.grouping_id == 0
    ]
    # the NULL-event_type GROUP's subtotal: event_type None AND day None,
    # told apart from the grand total only by grouping_id
    null_group_subtotal = [
        r for r in out if r.event_type is None and r.day is None and r.grouping_id == 1
    ]
    grand = [r for r in out if r.grouping_id == 3]
    assert len(data_null) == 1 and data_null[0].n_events == 1
    assert len(null_group_subtotal) == 1 and null_group_subtotal[0].n_events == 1
    assert len(grand) == 1 and grand[0].n_events == 2
    assert grand[0].event_type is None and grand[0].day is None  # same keys!


def test_minhash_band_parameters_validated(spark):
    """Round-8 review: bands > num_hashes made every band slice EMPTY (one
    mega-bucket per band: silent zero recall past max_bucket, quadratic
    below it) and a non-dividing ratio silently ignored trailing signature
    rows."""
    import pytest

    from woe_monotonic_binning_spark.operators.dedup import minhash_dedup_pairs

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="divide"):
        minhash_dedup_pairs(docs, "text", "doc_id", num_hashes=8, bands=16)
    with pytest.raises(ValueError, match="divide"):
        minhash_dedup_pairs(docs, "text", "doc_id", num_hashes=60, bands=16)
    with pytest.raises(ValueError, match="unit"):
        from woe_monotonic_binning_spark.operators.dedup import shingled

        shingled(docs, "text", "doc_id", unit="chars")


def test_curate_corpus_jaccard_requires_block_cols(spark):
    """Round-8 review: block_cols=None fed an empty using-list join — a
    silent full cartesian self-join."""
    import pytest

    from woe_monotonic_binning_spark import curate_corpus

    docs = spark.createDataFrame(
        [(1, "a text here", "web")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="block_cols"):
        curate_corpus(docs, near_dup="jaccard")


def test_multimodal_kernels_tolerate_null_payloads(spark):
    """Round-8 review: NULL binary payloads killed every mapInPandas
    kernel with a worker-side TypeError; they now yield NULL features."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        extract_features,
        fake_decode_stats,
        resize_media,
    )

    rows = [
        (1, "image", bytearray(b"abc"), ("m", 1, 1, 1000)),
        (2, "image", None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: int>",
    )
    stats = {r.media_id: r for r in fake_decode_stats(media).collect()}
    assert stats[1].n_bytes == 3 and stats[1].checksum is not None
    assert stats[2].n_bytes is None and stats[2].checksum is None
    feats = {r.media_id: r.feature for r in extract_features(media, dim=4).collect()}
    assert feats[1] is not None and feats[2] is None
    resized = {r.media_id: r.meta for r in resize_media(media, 8, 8).collect()}
    assert resized[1]["width"] == 8 and resized[2] is None


def test_sample_frames_covers_partial_interval_and_skips_empty(spark):
    """Round-8 review: floor(duration/every)-1 dropped the last
    partial-interval frame and zero-duration media still emitted one."""
    from woe_monotonic_binning_spark.operators.multimodal import sample_frames

    rows = [
        (1, "video", None, ("m", 1, 1, 2500)),
        (2, "video", None, ("m", 1, 1, 1999)),
        (3, "video", None, ("m", 1, 1, 0)),
        (4, "video", None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, content binary, "
        "meta struct<mime: string, width: int, height: int, duration_ms: int>",
    )
    got = {}
    for r in sample_frames(media, every_ms=1000).collect():
        got.setdefault(r.media_id, []).append(r.ts_ms)
    assert sorted(got[1]) == [0, 1000, 2000]  # 2500ms: 3 started intervals
    assert sorted(got[2]) == [0, 1000]
    assert 3 not in got and 4 not in got  # zero/NULL duration: no frames


# -- session_agg_twophase (skew-bounded split-merge sessionization) --


def test_session_twophase_matches_single_phase_on_events(spark):
    """The split-merge form must reproduce session_agg exactly: same
    session boundaries and event counts (bit-for-bit), total_value to
    1e-6 (same sum, different association order)."""
    from woe_monotonic_binning_spark.operators.windows import (
        session_agg,
        session_agg_twophase,
    )

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    one = {
        (r.session_start, r.session_end, r.user_id, r.n_events): r.total_value
        for r in session_agg(ev).collect()
    }
    two = {
        (r.session_start, r.session_end, r.user_id, r.n_events): r.total_value
        for r in session_agg_twophase(ev).collect()
    }
    assert one.keys() == two.keys()
    assert all(abs(one[k] - two[k]) <= 1e-6 for k in one)


def test_session_twophase_merges_across_bucket_boundaries(spark):
    """A session spanning three day-bucket cuts (events 10 minutes apart
    straddling two midnights) must come back as ONE session — the island
    merge, not the bucket split, defines the output; an hour-bucketed run
    over the same events agrees, proving correctness is bucket-invariant."""
    from datetime import datetime, timedelta

    from woe_monotonic_binning_spark.operators.windows import (
        session_agg,
        session_agg_twophase,
    )

    t0 = datetime(2024, 3, 1, 23, 40)
    rows = [(7, t0 + timedelta(minutes=10 * i), "click", 1.0) for i in range(300)]
    rows += [(7, datetime(2024, 3, 5, 12, 0), "click", 2.0)]  # separate session
    rows += [(8, datetime(2024, 3, 1, 5, 0), "view", 3.0)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )
    base = {
        (r.session_start, r.session_end, r.user_id, r.n_events)
        for r in session_agg(ev).collect()
    }
    for unit in ("day", "hour"):
        got = {
            (r.session_start, r.session_end, r.user_id, r.n_events)
            for r in session_agg_twophase(ev, bucket_unit=unit).collect()
        }
        assert got == base, f"bucket_unit={unit} diverged"
    # the 300-event chain really is one merged session
    n_user7 = [k for k in base if k[2] == 7]
    assert sorted(k[3] for k in n_user7) == [1, 300]


def test_session_agg_auto_picks_phase_on_planted_celebrity(spark, monkeypatch):
    """session_agg_auto (round 10): the sampled max-events-per-user probe
    routes a planted celebrity user to the two-phase plan and a healthy
    distribution to the single-shuffle plan; both routes produce the same
    sessions (parity pinned separately); an empty input is a no-crash
    single-phase."""
    import woe_monotonic_binning_spark.operators.windows as W

    calls: list[str] = []
    orig_single, orig_two = W.session_agg, W.session_agg_twophase
    monkeypatch.setattr(
        W, "session_agg",
        lambda *a, **k: (calls.append("single"), orig_single(*a, **k))[1],
    )
    monkeypatch.setattr(
        W, "session_agg_twophase",
        lambda *a, **k: (calls.append("two"), orig_two(*a, **k))[1],
    )

    rows = [
        (1, f"2024-01-0{d} {h:02d}:{m:02d}:00", 1.0)
        for d in (1, 2) for h in range(10) for m in range(15)
    ]  # celebrity user 1: 300 events over two days
    rows += [(u, "2024-01-01 05:00:00", 1.0) for u in range(2, 22)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))

    two = W.session_agg_auto(ev, hot_user_events=100, probe_fraction=1.0)
    assert calls[-1] == "two"
    single = W.session_agg_auto(ev, hot_user_events=10_000, probe_fraction=1.0)
    assert calls[-1] == "single"
    key = lambda r: (str(r.session_start), str(r.session_end), r.user_id, r.n_events)  # noqa: E731
    assert sorted(map(key, two.collect())) == sorted(map(key, single.collect()))

    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert W.session_agg_auto(empty, probe_fraction=1.0).count() == 0
    assert calls[-1] == "single"


def test_session_agg_user_col_param_and_single_job_probe(spark):
    """Round-10 verdict item 7: the session family takes ``user_col`` —
    renaming the key column gives identical sessions under the new name
    through both phases and the auto route — and session_agg_auto's probe
    is exactly ONE Spark action (job-group count), so routing adds one
    tiny job, never a second scan cascade."""
    import woe_monotonic_binning_spark.operators.windows as W

    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("user_id", "ts", "value")
    )
    renamed = ev.withColumnRenamed("user_id", "account")
    key = lambda r, u: (str(r.session_start), str(r.session_end), r[u], r.n_events)  # noqa: E731
    base = sorted(key(r, "user_id") for r in W.session_agg(ev).collect())
    for fn in (
        lambda d: W.session_agg(d, user_col="account"),
        lambda d: W.session_agg_twophase(d, user_col="account"),
        lambda d: W.session_agg_auto(d, probe_fraction=1.0, user_col="account"),
    ):
        out = fn(renamed)
        assert "account" in out.columns and "user_id" not in out.columns
        assert sorted(key(r, "account") for r in out.collect()) == base

    # the probe is ONE action over the sample: under AQE a single action
    # materializes each exchange as its own stage-job, so the probe's two
    # tiny aggregations bound the group at <= 4 jobs — a full per-user
    # count of the corpus or a per-partition cascade would blow past it
    sc = spark.sparkContext
    sc.setJobGroup("wmb_probe_count", "session_agg_auto probe")
    try:
        plan = W.session_agg_auto(ev, probe_fraction=0.5)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("wmb_probe_count")
    assert 1 <= len(jobs) <= 4, f"probe ran {len(jobs)} jobs"
    assert plan.count() >= 0  # the returned plan is still runnable


def test_asof_join_forward_and_nearest_directions(spark):
    """Round-9 direction support: forward attaches the EARLIEST right row
    at-or-after, nearest picks the closer side with backward winning
    ties (pandas merge_asof convention); unmatched rows stay NULL."""
    from woe_monotonic_binning_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),  # backward 09:00, forward 11:30
            (1, "2024-01-01 11:30:00"),  # equal ts: inclusive both ways
            (2, "2024-01-01 08:00:00"),  # before every right row
            (3, "2024-01-01 08:00:00"),  # key with no right rows at all
        ],
        "k long, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 09:00:00", "a"),
            (1, "2024-01-01 11:30:00", "b"),
            (1, "2024-01-01 12:00:00", "c"),
            (2, "2024-01-01 09:00:00", "d"),
        ],
        "k long, rts string, tag string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    def tags(direction):
        out = asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", direction=direction
        )
        return {(r.k, str(r.lts)): r.tag for r in out.collect()}

    fwd = tags("forward")
    assert fwd[(1, "2024-01-01 10:00:00")] == "b"  # earliest at-or-after
    assert fwd[(1, "2024-01-01 11:30:00")] == "b"  # inclusive on equality
    assert fwd[(2, "2024-01-01 08:00:00")] == "d"
    assert fwd[(3, "2024-01-01 08:00:00")] is None

    near = tags("nearest")
    # 10:00 is 60min after 09:00, 90min before 11:30 -> backward 'a'
    assert near[(1, "2024-01-01 10:00:00")] == "a"
    assert near[(1, "2024-01-01 11:30:00")] == "b"  # exact hit
    assert near[(2, "2024-01-01 08:00:00")] == "d"  # only forward exists
    assert near[(3, "2024-01-01 08:00:00")] is None

    bwd = tags("backward")
    assert bwd[(1, "2024-01-01 11:30:00")] == "b"  # inclusive on equality
    assert bwd[(2, "2024-01-01 08:00:00")] is None

    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts", direction="sideways")


def test_asof_join_nearest_tie_prefers_backward(spark):
    """Equidistant backward/forward matches resolve to the backward row."""
    from woe_monotonic_binning_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "before"), (1, "2024-01-01 11:00:00", "after")],
        "k long, rts string, tag string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", direction="nearest"
    ).collect()
    assert out[0]["tag"] == "before"


def test_asof_join_null_right_ts_never_matches(spark):
    """Round-9 advice: a right row with a NULL timestamp sorts FIRST
    under ascending time (nulls first), so unfiltered it became the
    backward match with a NULL __ts payload — and the NULL then poisoned
    the 'nearest' closeness arithmetic into silently taking the forward
    arm.  NULL-ts right rows must never match in any direction."""
    from woe_monotonic_binning_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00")], "k long, lts string"
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [
            (1, None, "ghost"),  # NULL ts: must never match
            (1, "2024-01-01 09:30:00", "near_b"),  # 30 min back
            (1, "2024-01-01 12:00:00", "far_f"),  # 120 min forward
        ],
        "k long, rts string, tag string",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    def tag(direction):
        out = asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", direction=direction
        ).collect()
        return out[0]["tag"]

    assert tag("backward") == "near_b"  # not the NULL-ts ghost
    assert tag("forward") == "far_f"
    # nearest must pick the genuinely closer backward row — with the
    # ghost in play the NULL closeness comparison used to select far_f
    assert tag("nearest") == "near_b"

    # a key whose ONLY right rows have NULL ts behaves as unmatched
    right_all_null = spark.createDataFrame(
        [(1, None, "ghost")], "k long, rts string, tag string"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    for d in ("backward", "forward", "nearest"):
        out = asof_join(
            left, right_all_null, on="k", left_ts="lts", right_ts="rts", direction=d
        ).collect()
        assert out[0]["tag"] is None


def test_asof_join_forward_matches_duckdb(spark):
    """Forward direction vs DuckDB's native ASOF JOIN with the inequality
    flipped (l.ts <= r.ts) on real sf0.001 events/orders data."""
    import duckdb

    from woe_monotonic_binning_spark.operators.joins import asof_join

    sf = "/root/testdata/sf0.001"
    events = spark.read.parquet(f"{sf}/events.parquet")
    orders = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy(
            F.col("o_custkey").alias("user_id"),
            F.col("o_orderdate").cast("timestamp").alias("ots"),
        )
        .agg(F.round(F.sum("o_totalprice").cast("double"), 2).alias("day_spend"))
    )
    got = (
        asof_join(
            events.select("event_id", "user_id", F.col("ts").cast("timestamp")),
            orders,
            on="user_id",
            left_ts="ts",
            right_ts="ots",
            direction="forward",
        )
        .select("event_id", "day_spend")
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    exp = con.execute(
        """
        WITH ord AS (
          SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ots,
                 ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS day_spend
          FROM orders GROUP BY 1, 2
        )
        SELECT e.event_id, o.day_spend
        FROM events e ASOF LEFT JOIN ord o
          ON e.user_id = o.user_id AND e.ts <= o.ots
        ORDER BY e.event_id
        """
    ).fetchdf()
    assert got["event_id"].tolist() == exp["event_id"].tolist()
    import numpy as np

    g = got["day_spend"].to_numpy(dtype=float)
    e = exp["day_spend"].to_numpy(dtype=float)
    both_nan = np.isnan(g) & np.isnan(e)
    assert bool(np.all(both_nan | (np.abs(g - e) < 1e-9)))


@pytest.mark.parametrize("seed", range(4))
def test_session_agg_matches_per_event_reference_loop(spark, seed):
    """Randomized independent-oracle check for BOTH batch sessionizers: a
    per-event Python loop implementing session_window's TRUE contract (a
    session ends at last_ts + gap and an event at EXACTLY last + gap
    still MERGES — verified on a minimal frame) must reproduce session
    boundaries, counts and sums row-for-row.  The timestamp grid is a
    multiple of the gap so exact-boundary events occur by construction —
    this test caught the late-round-9 twophase island-rule defect (>=
    split a true session at a bucket cut) and the same wrong edge in the
    certified events-suite oracle."""
    import numpy as np
    import pandas as pd

    from woe_monotonic_binning_spark.operators.windows import (
        session_agg,
        session_agg_twophase,
    )

    rng = np.random.default_rng(seed)
    n = 400
    gap_s = 600  # 10 minutes
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 5, n),
            # steps of exactly gap/2 => consecutive diffs hit 0, gap/2,
            # exactly gap, 1.5*gap ... including the boundary case
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(
                np.sort(rng.integers(0, 2000, n)) * (gap_s // 2), unit="s"
            ),
            "value": np.round(rng.random(n) * 10, 3),
        }
    )

    expected = set()
    for uid, g in pdf.sort_values("ts").groupby("user_id"):
        start = last = None
        cnt, tot = 0, 0.0
        for ts, val in zip(g["ts"], g["value"]):
            if last is not None and (ts - last).total_seconds() > gap_s:
                expected.add(
                    (start, last + pd.Timedelta(seconds=gap_s), uid, cnt, round(tot, 6))
                )
                start, cnt, tot = None, 0, 0.0
            if start is None:
                start = ts
            last, cnt, tot = ts, cnt + 1, tot + float(val)
        if last is not None:
            expected.add(
                (start, last + pd.Timedelta(seconds=gap_s), uid, cnt, round(tot, 6))
            )

    ev = spark.createDataFrame(pdf)
    for impl in (
        lambda d: session_agg(d, "10 minutes"),
        lambda d: session_agg_twophase(d, "10 minutes", bucket_unit="hour"),
    ):
        got = {
            (
                pd.Timestamp(r.session_start),
                pd.Timestamp(r.session_end),
                r.user_id,
                r.n_events,
                round(r.total_value, 6),
            )
            for r in impl(ev).collect()
        }
        assert got == expected


@pytest.mark.parametrize("seed", range(6))
def test_asof_join_all_directions_match_pandas_merge_asof(spark, seed):
    """Randomized third-party-oracle check: every direction agrees with
    pandas.merge_asof row-for-row on random key/timestamp shapes —
    unmatched keys, left rows before/after every right row, and exact-ts
    hits included.  Right timestamps are unique per key (the documented
    determinism precondition); inclusive matching and nearest's
    backward-on-tie are pandas' own conventions, so this pins the engine
    to an oracle nobody on this repo wrote."""
    import numpy as np
    import pandas as pd

    from woe_monotonic_binning_spark.operators.joins import asof_join

    rng = np.random.default_rng(seed)
    n_left, n_right = 40, 30
    base = pd.Timestamp("2024-01-01")
    lpdf = pd.DataFrame(
        {
            "row_id": np.arange(n_left),
            # key 9 never appears on the right side
            "k": rng.integers(0, 4, n_left) * 3 % 10,
            "lts": base
            + pd.to_timedelta(rng.integers(0, 500, n_left) * 97, unit="s"),
        }
    )
    rts = []
    rk = []
    for key in (0, 3, 6):
        # unique right ts per key (documented precondition); even offsets
        # so ties with the odd-second grid above still occur via *97
        ts = np.unique(rng.integers(0, 500, n_right // 3) * 97)
        rts.extend(base + pd.to_timedelta(ts, unit="s"))
        rk.extend([key] * len(ts))
    rpdf = pd.DataFrame(
        {"k": rk, "rts": rts, "val": np.arange(len(rk), dtype=float) * 1.5}
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(rpdf)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                left,
                right,
                on="k",
                left_ts="lts",
                right_ts="rts",
                direction=direction,
            )
            .select("row_id", "val")
            .toPandas()
            .sort_values("row_id")
            .reset_index(drop=True)
        )
        exp = pd.merge_asof(
            lpdf.sort_values("lts"),
            rpdf.sort_values("rts"),
            by="k",
            left_on="lts",
            right_on="rts",
            direction=direction,
        ).sort_values("row_id")[["row_id", "val"]].reset_index(drop=True)
        g, e = got["val"].to_numpy(), exp["val"].to_numpy()
        both_nan = np.isnan(g) & np.isnan(e)
        assert bool(np.all(both_nan | (g == e))), (
            f"direction={direction} seed={seed} diverges from pandas"
        )


def test_decode_image_codec_hook(spark):
    """The round-12 codec= escape hatch: a user callable is tried before
    the built-in parsers (sentinel format decoded, fmt passed through),
    returning None or raising falls through (built-in PPM still decodes;
    junk still rejects) — the integration point for Pillow/ffmpeg on
    clusters that have them."""
    from woe_monotonic_binning_spark.operators.multimodal import decode_image

    def stub_codec(raw):
        if raw.startswith(b"FAKEIMG"):
            return ("jpeg", 2, 1, bytes([1, 2, 3, 4, 5, 6]))
        if raw.startswith(b"BOOM"):
            raise ValueError("corrupt payload")  # must not kill the worker
        return None

    ppm = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b"FAKEIMG-payload")),
            (2, "image", bytearray(ppm)),
            (3, "image", bytearray(b"BOOM then junk")),
            (4, "image", bytearray(b"not an image at all")),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(media, codec=stub_codec).collect()}
    assert rows[1].fmt == "jpeg"
    assert (rows[1].width, rows[1].height, rows[1].n_pixels) == (2, 1, 2)
    assert (rows[1].sum_r, rows[1].sum_g, rows[1].sum_b) == (5, 7, 9)
    # codec returned None -> built-in parser path unchanged
    assert rows[2].fmt == "ppm" and (rows[2].sum_r, rows[2].sum_g, rows[2].sum_b) == (50, 70, 90)
    # codec raised / nothing parses -> honest reject rows
    assert rows[3].fmt is None and rows[4].fmt is None
    # and without a codec the sentinel payload is just an unparseable row
    base = {r.media_id: r for r in decode_image(media).collect()}
    assert base[1].fmt is None and base[2].fmt == "ppm"


def test_decode_audio_codec_hook(spark):
    """decode_audio's codec= hook: sentinel compressed format decoded by
    the stub (per-channel sums, duration derived), None/raise falls
    through to the built-in WAV parser."""
    import struct
    import wave as wave_mod
    import io

    from woe_monotonic_binning_spark.operators.multimodal import decode_audio

    def stub_codec(raw):
        if raw.startswith(b"FAKEMP3"):
            return ("mp3", 2, 44100, 4, [100, -7])
        if raw.startswith(b"FAKE51"):
            # 5.1 multichannel (round-12 advice): nch > 2 must still feed
            # channel 1 into sum_pcm_r, not silently NULL it
            return ("ac3", 6, 48000, 10, [11, 22, 33, 44, 55, 66])
        if raw.startswith(b"BOOM"):
            raise ValueError("corrupt payload")
        return None

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(8000)
        wv.writeframes(struct.pack("<4h", 5, -2, 7, 10))
    wav = buf.getvalue()
    media = spark.createDataFrame(
        [
            (1, "audio", bytearray(b"FAKEMP3-payload")),
            (2, "audio", bytearray(wav)),
            (3, "audio", bytearray(b"BOOM junk")),
            (4, "audio", bytearray(b"FAKE51-payload")),
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_audio(media, codec=stub_codec).collect()}
    assert rows[1].fmt == "mp3"
    assert (rows[1].n_channels, rows[1].sample_rate, rows[1].n_frames) == (2, 44100, 4)
    assert rows[1].duration_ms == 4 * 1000 // 44100
    assert (rows[1].sum_pcm, rows[1].sum_pcm_r) == (100, -7)
    assert rows[2].fmt == "wav" and rows[2].sum_pcm == 20 and rows[2].sum_pcm_r is None
    assert rows[3].fmt is None
    assert rows[4].fmt == "ac3" and rows[4].n_channels == 6
    assert (rows[4].sum_pcm, rows[4].sum_pcm_r) == (11, 22)
    base = {r.media_id: r for r in decode_audio(media).collect()}
    assert base[1].fmt is None and base[2].fmt == "wav"


def test_decode_codec_malformed_returns_reject_rows_not_job(spark):
    """Round-12 review: a codec returning garbage must reject the ROW,
    never kill the stage — wrong-arity tuples, rate 0 on a malformed
    header (the common decoder-wrapper convention), non-3*w*h rasters,
    and a stereo report with a one-element sums sequence all fall
    through to the built-in parsers / the NULL row."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_audio,
        decode_image,
    )

    def bad_img_codec(raw):
        tag = raw[:1]
        if tag == b"A":
            return ("jpeg", 2, 1)  # wrong arity
        if tag == b"B":
            return ("jpeg", 2, 1, bytes(5))  # raster not 3*w*h
        if tag == b"C":
            return ("jpeg", 0, 1, b"")  # non-positive dims
        if tag == b"E":
            # raster LENGTH instead of the raster: bytes(3) would mint a
            # zero-filled buffer that passes the length check and lands
            # an all-black accepted row (round-12 review)
            return ("jpeg", 1, 1, 3)
        if tag == b"D":
            return ("jpeg", 1, 1, bytes([9, 9, 9]))  # the one valid row
        return None

    img = spark.createDataFrame(
        [
            (i, "image", bytearray(t))
            for i, t in enumerate([b"A", b"B", b"C", b"D", b"E"])
        ],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_image(img, codec=bad_img_codec).collect()}
    assert rows[3].fmt == "jpeg" and (rows[3].sum_r, rows[3].sum_g, rows[3].sum_b) == (9, 9, 9)
    for mid in (0, 1, 2, 4):
        assert rows[mid].fmt is None and rows[mid].sum_r is None

    def bad_aud_codec(raw):
        tag = raw[:1]
        if tag == b"A":
            return ("mp3", 1, 0, 4, [10])  # rate 0 -> division guard
        if tag == b"B":
            return ("mp3", 2, 44100, 4, [10])  # stereo, 1 sum
        if tag == b"C":
            return ("mp3", 1, 8000)  # wrong arity
        if tag == b"D":
            return ("mp3", 1, 8000, 4, [10])  # the one valid row
        return None

    aud = spark.createDataFrame(
        [(i, "audio", bytearray(t)) for i, t in enumerate([b"A", b"B", b"C", b"D"])],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in decode_audio(aud, codec=bad_aud_codec).collect()}
    assert rows[3].fmt == "mp3" and rows[3].sum_pcm == 10
    for mid in (0, 1, 2):
        assert rows[mid].fmt is None and rows[mid].sum_pcm is None


def _mk_dc_jpeg(w, h, dcs_bits, ac_extra=False):
    """Test-side DC-only baseline JPEG builder (independent of the engine
    fixture): flat quant table of 8s, canonical DC table "00"=cat5 /
    "01"=cat1, AC table "0"=EOB (with ac_extra, 2-bit codes "00"=EOB /
    "01"=(run 0, size 1)).  dcs_bits = per component, a list of
    pre-encoded entropy bitstrings, one per 8x8 block."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    ncomp = len(dcs_bits)
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([8] * 64))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for c in range(ncomp):
        sof += bytes([c + 1, 0x11, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([5, 1]))
    if ac_extra:
        out += seg(0xC4, bytes([0x10]) + bytes([0, 2] + [0] * 14) + bytes([0, 1]))
    else:
        out += seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    if ncomp > 1:
        bitstr = "".join("".join(x) for x in zip(*dcs_bits))
    else:
        bitstr = "".join(dcs_bits[0])
    bitstr += "1" * ((-len(bitstr)) % 8)
    data = bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
    stuffed = b"".join(bytes([x]) + (b"\x00" if x == 0xFF else b"") for x in data)
    return out + stuffed + b"\xff\xd9"


def _dc_bits(diff, eob="0"):
    if 16 <= diff <= 31:
        return "00" + format(diff, "05b") + eob
    if diff == 1:
        return "01" + "1" + eob
    if diff == -1:
        return "01" + "0" + eob
    raise ValueError(diff)


def test_parse_jpeg_dc_blocks_and_prediction():
    """Flat DC-only blocks decode to the closed-form pixel values, the DC
    predictor carries across MCUs, and non-MCU-multiple widths crop."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    w, h, px, _o = _parse_jpeg(_mk_dc_jpeg(8, 8, [[_dc_bits(20)]]))
    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    assert (w, h) == (8, 8) and (a == 148).all()
    # two MCUs: dc 20 then diff +1 -> 148 | 149
    w, h, px, _o = _parse_jpeg(_mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(1)]]))
    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    assert (a[:, :8] == 148).all() and (a[:, 8:] == 149).all()
    # crop: 12x8 needs 2 MCUs but keeps 12 columns
    w, h, px, _o = _parse_jpeg(_mk_dc_jpeg(12, 8, [[_dc_bits(20), _dc_bits(1)]]))
    assert (w, h) == (12, 8) and len(px) == 12 * 8 * 3


def test_parse_jpeg_ycbcr_color_conversion():
    """3-component 4:4:4: chroma DC offsets run through the JFIF YCbCr->RGB
    matrix with round-half handling matching numpy rint."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    j = _mk_dc_jpeg(8, 8, [[_dc_bits(20)], [_dc_bits(1)], [_dc_bits(-1)]])
    w, h, px, _o = _parse_jpeg(j)
    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3).astype(int)
    y, cb, cr = 148.0, 129.0, 127.0
    exp = [
        int(np.rint(y + 1.402 * (cr - 128))),
        int(np.rint(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))),
        int(np.rint(y + 1.772 * (cb - 128))),
    ]
    assert (a == exp).all()


def test_parse_jpeg_ac_coefficient_idct():
    """A single AC coefficient ((0,1) in zigzag = horizontal frequency 1)
    exercises run-length decode + dequant + IDCT; expected pixels computed
    from the independently-written cosine formula."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    # entropy per block: DC cat5 of 20 ("00"+5 bits) + AC (0,1) "01" with
    # magnitude bit 1 (+1) + EOB "00"
    bits = "00" + format(20, "05b") + "01" + "1" + "00"
    j = _mk_dc_jpeg(8, 8, [[bits]], ac_extra=True)
    w, h, px, _o = _parse_jpeg(j)
    a = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    x = np.arange(8)
    # S00 = 20*8, S(u=0,v=1) = 1*8; f(x) = S00/8 + (1/4)*cos((2x+1)pi/16)*8*sqrt(1/2)... 
    # written out: f(y,x) = 20 + 0.25 * c0 * c1 * 8 * cos((2x+1)*1*pi/16)
    # with c0 = 1/sqrt(2) (u=0 row factor), c1 = 1
    expected = 128 + 20 + 0.25 * (1 / np.sqrt(2)) * 8 * np.cos((2 * x + 1) * np.pi / 16)
    expected = np.clip(np.rint(expected), 0, 255).astype(int)
    for col in range(8):
        assert (a[:, col, 0] == expected[col]).all(), (col, a[0, col, 0], expected[col])


def test_parse_jpeg_honest_rejects():
    """Progressive (SOF2), arithmetic (long-marker set), truncated entropy
    data, garbage, 16-bit quant tables: all return None — the tolerant
    fall-through contract — and a corrupted entropy byte changes pixels
    (the decode is not ignoring the payload)."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    assert _parse_jpeg(b"not a jpeg") is None
    assert _parse_jpeg(b"\xff\xd8\xff") is None
    assert _parse_jpeg(b"\xff\xd8\xff\xc2\x00\x04ab") is None  # progressive
    # round-13 review crashes, now clean rejects: empty SOF0 body and an
    # SOS too short for its declared component pairs
    assert _parse_jpeg(b"\xff\xd8\xff\xc0\x00\x02\xff\xd9") is None
    import struct as _st

    def _sg(m, p):
        return bytes([0xFF, m]) + _st.pack(">H", len(p) + 2) + p

    trunc_sos = (
        b"\xff\xd8"
        + _sg(0xDB, bytes([0]) + bytes([8] * 64))
        + _sg(0xC0, bytes([8]) + _st.pack(">HH", 8, 8) + bytes([3])
              + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]))
        + _sg(0xDA, bytes([3]))
    )
    assert _parse_jpeg(trunc_sos) is None
    good = _mk_dc_jpeg(8, 8, [[_dc_bits(20)]])
    # 16-bit quant table (Pq=1) rejects
    bad_q = bytearray(good)
    dqt_at = good.index(b"\xff\xdb") + 4
    bad_q[dqt_at] = 0x10
    assert _parse_jpeg(bytes(bad_q)) is None
    # truncated entropy data rejects (cut before the entropy byte)
    assert _parse_jpeg(good[:-3]) is None
    # corrupt the entropy byte -> decodes to DIFFERENT pixels, not None
    mut = bytearray(good)
    mut[-3] = 21 << 1  # entropy byte encodes dc; 20 -> 21
    got = _parse_jpeg(bytes(mut))
    assert got is not None
    a = np.frombuffer(got[2], dtype=np.uint8)
    assert (a == 149).all()  # dc 21, not 20


def test_parse_jpeg_fill_bytes_and_scan_validation():
    """Round-14 advice hardening: (a) spec-legal 0xFF fill bytes before
    markers (T.81 B.1.1.2) — including before RSTn inside entropy data —
    decode identically instead of rejecting; (b) a progressive DC scan
    header with Ss=0, Se>0 rejects instead of silently decoding DC-only;
    (c) a ZRL run that crosses the block/band end is corrupt data ->
    honest reject, not wrong-but-bounded pixels."""
    import struct

    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    # (a) fill bytes before DQT, SOS and EOI leave the decode unchanged
    good = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(1)]])
    ref = _parse_jpeg(good)
    assert ref is not None
    dqt_at = good.index(b"\xff\xdb")
    sos_at = good.index(b"\xff\xda")
    padded = (
        good[:dqt_at] + b"\xff" + good[dqt_at:sos_at] + b"\xff\xff"
        + good[sos_at:-2] + b"\xff" + good[-2:]
    )
    assert _parse_jpeg(padded) == ref
    # fill byte before an RSTn inside the entropy-coded data
    base = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(20)]])
    rst_sos = base.index(b"\xff\xda")
    entropy = bytes([20 << 1])
    with_fill_rst = (
        base[:rst_sos]
        + seg(0xDD, struct.pack(">H", 1))
        + base[rst_sos : rst_sos + 10]
        + entropy + b"\xff\xff\xd0" + entropy + b"\xff\xd9"
    )
    r = _parse_jpeg(with_fill_rst)
    assert r is not None
    assert (np.frombuffer(r[2], dtype=np.uint8) == 148).all()

    # (b) progressive DC scan must have Se == 0 (T.81 G.1.1.1.1)
    def prog(sos_tail, entropy_byte):
        return (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([8] * 64))
            + seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes([0, 2] + [0] * 14)
                  + bytes([5, 1]))
            + seg(0xDA, bytes([1, 1, 0x00]) + sos_tail)
            + entropy_byte + b"\xff\xd9"
        )

    ok = _parse_jpeg(prog(bytes([0, 0, 0]), b"\x29"))  # Ss=0 Se=0: valid
    assert ok is not None
    assert (np.frombuffer(ok[2], dtype=np.uint8) == 148).all()
    assert _parse_jpeg(prog(bytes([0, 5, 0]), b"\x29")) is None  # Se=5

    # (c) baseline ZRL past position 63 rejects; a band-legal ZRL run
    # with EOB still decodes (same custom AC table: "00"=EOB, "01"=ZRL)
    def zrl_jpeg(n_zrl, tail="00"):
        bits = "00" + format(20, "05b") + "01" * n_zrl + tail
        bits += "1" * ((-len(bits)) % 8)
        data = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
        return (
            b"\xff\xd8"
            + seg(0xDB, bytes([0]) + bytes([8] * 64))
            + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes([0, 2] + [0] * 14)
                  + bytes([5, 1]))
            + seg(0xC4, bytes([0x10]) + bytes([0, 2] + [0] * 14)
                  + bytes([0x00, 0xF0]))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + data + b"\xff\xd9"
        )

    legal = _parse_jpeg(zrl_jpeg(3))  # k = 1 + 48 = 49, then EOB
    assert legal is not None
    assert (np.frombuffer(legal[2], dtype=np.uint8) == 148).all()
    assert _parse_jpeg(zrl_jpeg(4, tail="")) is None  # k = 65 > 64


def test_synthetic_jpeg_media_certifies_decoder(spark):
    """JVM-built JPEG fixture end-to-end: decoded sums equal the
    closed-form 64*(257+2*dc1) for every row, fmt/dims pinned."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_jpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(23)], "doc_id long")
    rows = {r.media_id: r for r in decode_image(synthetic_jpeg_media(docs)).collect()}
    assert len(rows) == 23
    for mid, r in rows.items():
        dc1 = 16 + mid % 16
        exp = 64 * (257 + 2 * dc1)
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("jpeg", 16, 8, 128)
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp, exp, exp), mid


def _exif_app1(orient, le=True, tag=0x0112):
    """APP1 Exif segment with a single IFD0 entry (orientation by
    default), in either byte order."""
    import struct

    if le:
        tiff = (b"II*\x00\x08\x00\x00\x00" + b"\x01\x00"
                + struct.pack("<HHI", tag, 3, 1)
                + struct.pack("<H", orient) + b"\x00\x00"
                + b"\x00\x00\x00\x00")
    else:
        tiff = (b"MM\x00*\x00\x00\x00\x08" + b"\x00\x01"
                + struct.pack(">HHI", tag, 3, 1)
                + struct.pack(">H", orient) + b"\x00\x00"
                + b"\x00\x00\x00\x00")
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def test_parse_jpeg_exif_orientation_reported():
    """APP1 TIFF orientation is reported (both byte orders) without
    disturbing the decode; out-of-range values, non-orientation tags and
    malformed Exif payloads yield None orientation, never a reject."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    base = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(1)]])
    plain = _parse_jpeg(base)
    assert plain is not None and plain[3] is None
    for le in (True, False):
        for o in range(1, 9):
            got = _parse_jpeg(base[:2] + _exif_app1(o, le=le) + base[2:])
            assert got[:3] == plain[:3] and got[3] == o, (le, o)
    # value 0 / 9: out of range -> None; a different tag -> None;
    # truncated Exif payload -> ignored, decode intact
    for bad in (
        _exif_app1(0), _exif_app1(9), _exif_app1(6, tag=0x0113),
        b"\xff\xe1\x00\x08Exif\x00\x00",
    ):
        got = _parse_jpeg(base[:2] + bad + base[2:])
        assert got[:3] == plain[:3] and got[3] is None


def test_resize_image_applies_exif_orientation(spark):
    """resize_image uprights the raster before resampling: a 16x16
    four-quadrant source (148/149/150/151) lands its quadrants exactly
    where each of the 8 orientations dictates (identity-size resize), and
    an orientation-6 16x8 source resizes through the swapped 8x16 axes."""
    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import resize_image

    base = _mk_dc_jpeg(
        16, 16, [[_dc_bits(20), _dc_bits(1), _dc_bits(1), _dc_bits(1)]]
    )
    expected = {
        1: [[148, 149], [150, 151]], 2: [[149, 148], [151, 150]],
        3: [[151, 150], [149, 148]], 4: [[150, 151], [148, 149]],
        5: [[148, 150], [149, 151]], 6: [[150, 148], [151, 149]],
        7: [[151, 149], [150, 148]], 8: [[149, 151], [148, 150]],
    }
    media = spark.createDataFrame(
        [(o, "image", bytearray(base[:2] + _exif_app1(o) + base[2:]))
         for o in range(1, 9)],
        "media_id long, kind string, content binary",
    )
    rows = {r.media_id: r for r in resize_image(media, 16, 16).collect()}
    for o, quads in expected.items():
        raw = bytes(rows[o].content)
        body = raw.split(b"\n", 3)[3]
        arr = np.frombuffer(body, dtype=np.uint8).reshape(16, 16, 3)
        got = [[int(arr[4, 4, 0]), int(arr[4, 12, 0])],
               [int(arr[12, 4, 0]), int(arr[12, 12, 0])]]
        assert got == quads, o
    # orientation 6 on a 16x8 source: upright is 8x16, so a 4x8 resize
    # samples the rotated geometry (left stored block -> bottom rows)
    wide = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(1)]])
    media6 = spark.createDataFrame(
        [(0, "image", bytearray(wide[:2] + _exif_app1(6) + wide[2:]))],
        "media_id long, kind string, content binary",
    )
    r = resize_image(media6, 4, 8).collect()[0]
    arr = np.frombuffer(
        bytes(r.content).split(b"\n", 3)[3], dtype=np.uint8
    ).reshape(8, 4, 3)
    # stored: left block 148, right block 149; rot90 CW maps upright row
    # i to stored column i, so the LEFT stored block becomes the TOP
    # rows: rows 0-3 are 148, rows 4-7 are 149
    assert (arr[:4, :, 0] == 148).all() and (arr[4:, :, 0] == 149).all()


def test_synthetic_jpeg_422_and_crop_fixtures(spark):
    """Round-14 fixtures: the 4:2:2 color twin decodes every pixel to
    exactly (Y-1, Y, Y+2), and the width-12 variant of the baseline
    fixture decodes-then-crops (only 4 columns of block 2 survive)."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_jpeg_422_media,
        synthetic_jpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(19)], "doc_id long")
    rows = {
        r.media_id: r
        for r in decode_image(synthetic_jpeg_422_media(docs)).collect()
    }
    assert len(rows) == 19
    for mid, r in rows.items():
        y = 144 + mid % 16
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("jpeg", 16, 8, 128)
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            128 * (y - 1), 128 * y, 128 * (y + 2)
        ), mid
    rows = {
        r.media_id: r
        for r in decode_image(synthetic_jpeg_media(docs, width=12)).collect()
    }
    for mid, r in rows.items():
        dc1 = 16 + mid % 16
        exp = 64 * (128 + dc1) + 32 * (129 + dc1)
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("jpeg", 12, 8, 96)
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp, exp, exp), mid
    import pytest

    with pytest.raises(ValueError):
        synthetic_jpeg_media(docs, width=17)


def _mk_png(w, h, pixels, interlace=0):
    """Test-side PNG builder (independent of the engine fixtures): 8-bit
    RGB, filter 0 scanlines, real zlib stream; pixels = {(x, y): (r,g,b)}.
    With interlace=1 the raster is serialized in Adam7 pass order."""
    import struct
    import zlib

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace)
    if interlace == 0:
        raw = b"".join(
            b"\x00" + b"".join(bytes(pixels[(x, y)]) for x in range(w))
            for y in range(h)
        )
    else:
        passes = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
                  (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
        raw = b""
        for x0, dx, y0, dy in passes:
            xs = list(range(x0, w, dx))
            ys = list(range(y0, h, dy))
            if not xs or not ys:
                continue
            for y in ys:
                raw += b"\x00" + b"".join(bytes(pixels[(x, y)]) for x in xs)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_parse_png_adam7_interlace_matches_progressive():
    """Adam7 deinterlacing (round 13): a 5x5 varying-pixel image encoded
    interlaced decodes to the IDENTICAL raster as its non-interlaced
    twin — constant color would be vacuous for pass placement, so every
    pixel is position-unique and any pass-scatter error shows."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_png

    px = {(x, y): (x * 40, y * 40, x + y) for x in range(5) for y in range(5)}
    plain = _parse_png(_mk_png(5, 5, px, interlace=0))
    inter = _parse_png(_mk_png(5, 5, px, interlace=1))
    assert plain is not None and inter is not None
    assert plain == inter
    w, h, rgb = inter
    assert (w, h) == (5, 5)
    # spot-check a few scattered positions directly
    for (x, y), (r, g, b) in list(px.items())[:8]:
        off = (y * 5 + x) * 3
        assert rgb[off : off + 3] == bytes((r, g, b)), (x, y)
    # sizes that hit EMPTY passes (w or h below a pass origin) still work
    for dims in ((1, 1), (2, 2), (3, 1), (1, 3), (8, 8), (9, 3)):
        ww, hh = dims
        pxs = {(x, y): (x, y, x ^ y) for x in range(ww) for y in range(hh)}
        assert _parse_png(_mk_png(ww, hh, pxs, 1)) == _parse_png(
            _mk_png(ww, hh, pxs, 0)
        ), dims
    # truncated interlaced stream rejects honestly: drop the last pass's
    # scanlines from the raster but keep the chunk framing valid
    import struct
    import zlib

    short_raw_png = _mk_png(5, 5, px, interlace=1)
    # rebuild with an IDAT whose decompressed raster is missing 10 bytes
    passes_raw = zlib.decompress(
        short_raw_png[short_raw_png.index(b"IDAT") + 4 : short_raw_png.index(b"IEND") - 8]
    )
    bad_idat = zlib.compress(passes_raw[:-10])
    body = struct.pack(">I", len(bad_idat)) + b"IDAT" + bad_idat + b"\x00" * 4
    rebuilt = (
        short_raw_png[: short_raw_png.index(b"IDAT") - 4]
        + body
        + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4
    )
    assert _parse_png(rebuilt) is None


def test_parse_jpeg_restart_markers_reset_dc_predictor():
    """DRI + RSTn between MCUs: the decoder byte-aligns at the marker and
    RESETS the DC predictor, so two full-magnitude dc=20 blocks around an
    RST0 both decode to 148 — a predictor that survives the restart would
    give 128+40 on block 2; APPn/COM segments in the header are skipped."""
    import struct

    import numpy as np

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    base = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(20)]])
    sos_at = base.index(b"\xff\xda")
    entropy = bytes([20 << 1])  # one full-magnitude dc=20 block
    with_rst = (
        base[:sos_at]
        + seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + base[sos_at : sos_at + 10]  # the 10-byte SOS segment
        + entropy + b"\xff\xd0" + entropy + b"\xff\xd9"
    )
    r = _parse_jpeg(with_rst)
    assert r is not None and (r[0], r[1]) == (16, 8)
    assert (np.frombuffer(r[2], dtype=np.uint8) == 148).all()
    # COM segment after SOI is skipped without disturbing the parse
    plain = _parse_jpeg(base)
    com = base[:2] + seg(0xFE, b"metadata comment") + base[2:]
    assert _parse_jpeg(com) == plain


def test_resize_image_accepts_jpeg_source(spark):
    """resize_image decodes baseline JPEG like the other formats: a flat
    DC-only 16x8 source resampled to 4x2 stays flat (nearest-neighbor of
    a constant raster), re-encoded as P6."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        resize_image,
        synthetic_jpeg_media,
    )

    docs = spark.createDataFrame([(5,)], "doc_id long")
    resized = resize_image(synthetic_jpeg_media(docs), 4, 2)
    r = resized.collect()[0]
    assert (r.fmt, r.width, r.height) == ("jpeg", 4, 2)
    out = decode_image(resized).collect()[0]
    dc1 = 16 + 5 % 16  # blocks are 128+dc1 / 129+dc1; 4x2 samples cols
    # nearest-neighbor x-map for 4 cols over 16: cols 0,4,8,12 -> first
    # two from block 1 (128+dc1), last two from block 2 (129+dc1), x2 rows
    exp = 2 * (2 * (128 + dc1) + 2 * (129 + dc1))
    assert out.fmt == "ppm" and (out.sum_r, out.sum_g, out.sum_b) == (exp, exp, exp)


def test_parse_jpeg_megapixel_bomb_rejects():
    """A ~100-byte payload declaring 65535x65535 must reject at the SOF0
    header (round-13 second review) — never reach the multi-GB plane
    allocation the per-parser except cannot catch once the OOM killer
    fires."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    bomb = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes([8] * 64))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 65535, 65535) + bytes([1])
              + bytes([1, 0x22, 0]))
        + seg(0xC4, bytes([0x00]) + bytes([0, 2] + [0] * 14) + bytes([5, 1]))
        + seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x28\xff\xd9"
    )
    assert len(bomb) < 200 and _parse_jpeg(bomb) is None


def test_parse_jpeg_oversized_dc_category_rejects():
    """Round-13 fuzz regression: a corrupted DHT can define a DC symbol
    byte > 15; receive(sym) would then mint a >int32 magnitude that
    overflowed the numpy coefficient assignment (OverflowError killing
    the row).  Craft exactly that table and assert a clean reject."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    bad = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes([8] * 64))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1])
              + bytes([1, 0x11, 0]))
        # DC table: single 1-bit code mapping to symbol 0xFF (category 255)
        + seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([0xFF]))
        + seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + b"\x00" * 40 + b"\xff\xd9"
    )
    assert _parse_jpeg(bad) is None


def test_parse_jpeg_mutation_fuzz_never_raises():
    """Deterministic mini-fuzz (seeded): byte flips + truncations over the
    test-encoder corpus must always reject-or-decode, never raise — the
    tolerant contract decode_image's per-parser except depends on for
    everything except MemoryError."""
    import random

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    base = _mk_dc_jpeg(16, 8, [[_dc_bits(20), _dc_bits(1)]])
    color = _mk_dc_jpeg(8, 8, [[_dc_bits(20)], [_dc_bits(1)], [_dc_bits(-1)]])
    rng = random.Random(711)
    for b0 in (base, color):
        for _ in range(300):
            m = bytearray(b0)
            for _ in range(rng.randint(1, 8)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            if rng.random() < 0.5:
                m = m[: rng.randrange(1, len(m))]
            _parse_jpeg(bytes(m))  # any non-MemoryError raise fails the test


def test_parse_png_dims_bomb_and_deflate_bomb_reject_fast():
    """Round-13 fuzz: a corrupt IHDR declaring huge dims must reject
    BEFORE the full-raster allocation (the Adam7 branch used to allocate
    h*stride first — a mutated header stalled the worker for minutes),
    and the inflate is max_length-capped so a DEFLATE bomb cannot blow
    past the raster the header declares."""
    import struct
    import time
    import zlib

    from woe_monotonic_binning_spark.operators.multimodal import _parse_png

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    for interlace in (0, 1):
        ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 2, 0, 0, interlace)
        bomb = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 1000))
            + chunk(b"IEND", b"")
        )
        t0 = time.time()
        assert _parse_png(bomb) is None
        assert time.time() - t0 < 1.0, interlace
    # a DEFLATE bomb under the pixel cap: tiny compressed stream, huge
    # declared raster it cannot fill -> clean reject, bounded memory
    ihdr = struct.pack(">IIBBBBB", 2000, 2000, 8, 2, 0, 0, 0)
    payload = zlib.compress(b"\x00" * (2000 * 6001), 9)  # ~35KB -> 12MB
    under_filled = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3000, 3000, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )
    assert _parse_png(under_filled) is None  # 12MB < the 3000x3000 raster


def test_parse_png_mutation_fuzz_never_raises():
    """Seeded mini-fuzz over progressive + interlaced PNGs (round 13):
    byte flips and truncations must reject-or-decode, never raise and
    never stall."""
    import random
    import struct
    import zlib

    from woe_monotonic_binning_spark.operators.multimodal import _parse_png

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    px = {(x, y): (x * 40 % 256, y * 40 % 256, (x + y) % 256)
          for x in range(9) for y in range(5)}
    corpus = [_mk_png(9, 5, px, interlace=i) for i in (0, 1)]
    rng = random.Random(29)
    for b0 in corpus:
        for _ in range(300):
            m = bytearray(b0)
            for _ in range(rng.randint(1, 8)):
                m[rng.randrange(len(m))] = rng.randrange(256)
            if rng.random() < 0.5:
                m = m[: rng.randrange(1, len(m))]
            _parse_png(bytes(m))


def test_parse_png_adam7_all_color_types():
    """Adam7 deinterlacing across every supported color type (0 gray /
    2 RGB via the main test / 3 palette / 4 gray+alpha / 6 RGBA): the
    per-pass unfilter is channel-parameterized, so each type's interlaced
    raster must equal its progressive twin byte-for-byte."""
    import struct
    import zlib

    from woe_monotonic_binning_spark.operators.multimodal import _parse_png

    def chunk(ctype, data):
        return struct.pack(">I", len(data)) + ctype + data + b"\x00" * 4

    def mk(w, h, color, interlace, row_fn, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, interlace)
        if interlace == 0:
            raw = b"".join(b"\x00" + row_fn(range(w), y) for y in range(h))
        else:
            passes = ((0, 8, 0, 8), (4, 8, 0, 8), (0, 4, 4, 8), (2, 4, 0, 4),
                      (0, 2, 2, 4), (1, 2, 0, 2), (0, 1, 1, 2))
            raw = b""
            for x0, dx, y0, dy in passes:
                xs, ys = list(range(x0, w, dx)), list(range(y0, h, dy))
                if not xs or not ys:
                    continue
                for y in ys:
                    raw += b"\x00" + row_fn(xs, y)
        out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        if plte:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    plte = bytes([10, 5, 20, 50, 85, 80, 90, 165, 140])
    cases = [
        (0, lambda xs, y: bytes((x * 7 + y * 31) % 256 for x in xs), None),
        (3, lambda xs, y: bytes((x + y) % 3 for x in xs), plte),
        (4, lambda xs, y: b"".join(
            bytes(((x * 7 + y * 31) % 256, 200)) for x in xs), None),
        (6, lambda xs, y: b"".join(
            bytes((x * 40 % 256, y * 40 % 256, (x + y) % 256, 77)) for x in xs),
         None),
    ]
    for color, row_fn, p in cases:
        prog = _parse_png(mk(5, 5, color, 0, row_fn, p))
        inter = _parse_png(mk(5, 5, color, 1, row_fn, p))
        assert prog is not None and prog == inter, color


# ---- progressive JPEG test encoder (round 13 late) ----

_TDC_COUNTS = [0, 0, 6] + [0] * 13          # DC cats 0-5 at 3-bit codes
_TDC_SYMS = [0, 1, 2, 3, 4, 5]
_TAC_COUNTS = [0, 0, 0, 5] + [0] * 12       # 4-bit codes
_TAC_SYMS = [0x00, 0x01, 0x02, 0x10, 0xF0]  # EOB0, (0,1), (0,2), EOB1, ZRL


def _huff_map(counts, syms):
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[syms[k]] = format(code, f"0{length}b")
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODE = _huff_map(_TDC_COUNTS, _TDC_SYMS)
_AC_CODE = _huff_map(_TAC_COUNTS, _TAC_SYMS)


def _mag_bits(v):
    """JPEG category + magnitude bits for a signed value."""
    cat = abs(v).bit_length()
    if cat == 0:
        return 0, ""
    body = v if v >= 0 else v + (1 << cat) - 1
    return cat, format(body & ((1 << cat) - 1), f"0{cat}b")


def _mk_jpeg(w, h, marker, scans):
    """Grayscale JPEG with the shared test tables; scans = list of
    ((td, ta), ss, se, ah, al, bitstring)."""
    import struct

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0x00]) + bytes([8] * 64))
    out += seg(marker, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00]) + bytes(_TDC_COUNTS) + bytes(_TDC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_TAC_COUNTS) + bytes(_TAC_SYMS))
    for (td, ta), ss, se, ah, al, bitstr in scans:
        out += seg(0xDA, bytes([1, 1, (td << 4) | ta, ss, se, (ah << 4) | al]))
        bitstr += "1" * ((-len(bitstr)) % 8)
        data = bytes(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
        out += b"".join(bytes([x]) + (b"\x00" if x == 0xFF else b"") for x in data)
    return out + b"\xff\xd9"


def _dc_code(diff):
    cat, bits = _mag_bits(diff)
    return _DC_CODE[cat] + bits


def test_progressive_dc_successive_approximation_matches_baseline():
    """Two-scan progressive DC (first pass in the >>1 domain, then one
    refinement bit per block) must decode byte-identically to the
    baseline twin carrying the same DC values (20 then 21)."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    dcs = [20, 21]
    base_bits = ""
    prev = 0
    for v in dcs:
        base_bits += _dc_code(v - prev) + _AC_CODE[0x00]
        prev = v
    baseline = _mk_jpeg(16, 8, 0xC0, [((0, 0), 0, 63, 0, 0, base_bits)])
    # scan 1: DC first, Al=1 -> diffs of (v >> 1); scan 2: refine bits
    s1, prev = "", 0
    for v in dcs:
        s1 += _dc_code((v >> 1) - prev)
        prev = v >> 1
    s2 = "".join(str(v & 1) for v in dcs)
    prog = _mk_jpeg(16, 8, 0xC2, [
        ((0, 0), 0, 0, 0, 1, s1),
        ((0, 0), 0, 0, 1, 0, s2),
    ])
    rb, rp = _parse_jpeg(baseline), _parse_jpeg(prog)
    assert rb is not None and rb == rp
    import numpy as np

    a = np.frombuffer(rb[2], dtype=np.uint8).reshape(8, 16, 3)
    assert (a[:, :8] == 148).all() and (a[:, 8:] == 149).all()


def test_progressive_ac_spectral_selection_and_refinement():
    """DC-first + AC-first (Al=1) + AC-refinement (Al=0) must reconstruct
    the same coefficients as the baseline twin (DC=20, AC at zigzag 1 =
    3): the refinement pass supplies the low bit of the existing coeff."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    # baseline: DC 20, then (run 0, size 2) value 3, then EOB
    cat, bits = _mag_bits(3)
    assert cat == 2
    base_bits = _dc_code(20) + _AC_CODE[0x02] + bits + _AC_CODE[0x00]
    baseline = _mk_jpeg(8, 8, 0xC0, [((0, 0), 0, 63, 0, 0, base_bits)])
    # progressive: DC full (Al=0); AC first at Al=1 codes 3>>1=1 via
    # (0,1)+bit 1 then EOB; AC refine at Al=0: correction bit (3 & 1)
    s_dc = _dc_code(20)
    s_ac1 = _AC_CODE[0x01] + "1" + _AC_CODE[0x00]
    # refine scan: EOB0 puts the whole band in an EOB run, during which
    # the existing nonzero coeff's correction bit (1: set the Al bit) is
    # still read — hence the trailing "1"
    s_ac2 = _AC_CODE[0x00] + "1"
    prog = _mk_jpeg(8, 8, 0xC2, [
        ((0, 0), 0, 0, 0, 0, s_dc),
        ((0, 0), 1, 63, 0, 1, s_ac1),
        ((0, 0), 1, 63, 1, 0, s_ac2),
    ])
    rb, rp = _parse_jpeg(baseline), _parse_jpeg(prog)
    assert rb is not None and rb == rp


def test_progressive_eob_run_spans_blocks():
    """An EOB1 run in the first AC scan covers the current AND the next
    block (eobrun bookkeeping across blocks); result equals the DC-only
    baseline twin."""
    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    base_bits = (_dc_code(20) + _AC_CODE[0x00]) + (_dc_code(1) + _AC_CODE[0x00])
    baseline = _mk_jpeg(16, 8, 0xC0, [((0, 0), 0, 63, 0, 0, base_bits)])
    s_dc = _dc_code(20) + _dc_code(1)
    s_ac = _AC_CODE[0x10] + "0"  # EOB1, appended bit 0 -> run of 2 blocks
    prog = _mk_jpeg(16, 8, 0xC2, [
        ((0, 0), 0, 0, 0, 0, s_dc),
        ((0, 0), 1, 63, 0, 0, s_ac),
    ])
    rb, rp = _parse_jpeg(baseline), _parse_jpeg(prog)
    assert rb is not None and rb == rp


def test_progressive_real_files_decode():
    """Real SOF2 files shipped with Spark/nodejs (skip if absent): the
    grayscale photo decodes r=g=b at its known dims; the white-stripe
    images decode near-white."""
    import glob
    import os

    import numpy as np
    import pytest

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    spark_imgs = sorted(
        glob.glob("/opt/spark*/data/mllib/images/origin/multi-channel/grayscale.jpg")
    )
    stripes = [p for p in ("/usr/share/doc/nodejs/thin-white-stripe.jpg",
                           "/usr/share/doc/nodejs/full-white-stripe.jpg")
               if os.path.exists(p)]
    if not spark_imgs and not stripes:
        pytest.skip("no real progressive JPEGs on this host")
    if spark_imgs:
        r = _parse_jpeg(open(spark_imgs[0], "rb").read())
        assert r is not None and (r[0], r[1]) == (300, 215)
        a = np.frombuffer(r[2], dtype=np.uint8).reshape(215, 300, 3)
        assert (a[:, :, 0] == a[:, :, 1]).all() and (a[:, :, 1] == a[:, :, 2]).all()
    for p in stripes:
        r = _parse_jpeg(open(p, "rb").read())
        assert r is not None, p
        a = np.frombuffer(r[2], dtype=np.uint8)
        assert a.mean() > 200, p  # overwhelmingly white content


def test_synthetic_jpeg_progressive_media_certifies_decoder(spark):
    """JVM-built PROGRESSIVE fixture end-to-end: two-scan successive
    approximation decodes to the closed-form 64*(258+2*dc1) sums."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_jpeg_progressive_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(23)], "doc_id long")
    rows = {
        r.media_id: r
        for r in decode_image(synthetic_jpeg_progressive_media(docs)).collect()
    }
    assert len(rows) == 23
    for mid, r in rows.items():
        dc1 = 16 + mid % 16
        exp = 64 * (258 + 2 * dc1)
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("jpeg", 16, 8, 128)
        assert (r.sum_r, r.sum_g, r.sum_b) == (exp, exp, exp), mid


def test_parse_jpeg_dc_predictor_overflow_rejects():
    """Round-13 third review: an adversarial stream of repeated
    max-category DC diffs pushes the predictor past any legal 8-bit DC
    value; with Al=13 the shifted store would exceed int32 (silent wrap
    on numpy 1.x, OverflowError on numpy 2).  The predictor is bounded
    at |v| > 32768 -> clean reject, never a raise or garbage decode."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import _parse_jpeg

    def seg(m, p):
        return bytes([0xFF, m]) + struct.pack(">H", len(p) + 2) + p

    n_blocks = 1200  # 1200 * +31 diffs -> predictor 37200 > 32768
    w = 8 * n_blocks
    entropy = bytes([int(_DC_CODE[5] + "11111", 2)] * n_blocks)
    for marker, alal in ((0xC2, 0x01), (0xC0, 0x00)):  # progressive + baseline
        scans = seg(0xDA, bytes([1, 1, 0x00, 0, 0 if marker == 0xC2 else 63, alal]))
        jpeg = (
            b"\xff\xd8"
            + seg(0xDB, bytes([0x00]) + bytes([8] * 64))
            + seg(marker, bytes([8]) + struct.pack(">HH", 8, w) + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(_TDC_COUNTS) + bytes(_TDC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(_TAC_COUNTS) + bytes(_TAC_SYMS))
            + scans + entropy + b"\xff\xd9"
        )
        # baseline blocks also need an AC EOB each — rebuild its entropy
        if marker == 0xC0:
            per_block = _DC_CODE[5] + "11111" + _AC_CODE[0x00]
            bits = per_block * n_blocks
            bits += "1" * ((-len(bits)) % 8)
            ent = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
            ent = b"".join(bytes([x]) + (b"\x00" if x == 0xFF else b"") for x in ent)
            jpeg = jpeg[: -len(entropy) - 2] + ent + b"\xff\xd9"
        assert _parse_jpeg(jpeg) is None, hex(marker)


def test_synthetic_jpeg_420_media_certifies_color_path(spark):
    """JVM-built 4:2:0 COLOR fixture end-to-end: interleaved MCU decode +
    chroma upsampling + YCbCr->RGB give exactly (Y-1, Y, Y+2) per pixel."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_image,
        synthetic_jpeg_420_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(23)], "doc_id long")
    rows = {
        r.media_id: r for r in decode_image(synthetic_jpeg_420_media(docs)).collect()
    }
    assert len(rows) == 23
    for mid, r in rows.items():
        y = 144 + mid % 16
        assert (r.fmt, r.width, r.height, r.n_pixels) == ("jpeg", 16, 16, 256)
        assert (r.sum_r, r.sum_g, r.sum_b) == (
            256 * (y - 1), 256 * y, 256 * (y + 2)
        ), mid


# -- round 16: perceptual dHash ----------------------------------------------


def _ppm(w, h, val):
    """P6 bytes with pixel (x, y) = constant triple val(x, y)."""
    body = b"".join(
        bytes([val(x, y)] * 3) for y in range(h) for x in range(w)
    )
    return f"P6\n{w} {h}\n255\n".encode() + body


def test_dhash_closed_form_and_rejects(spark):
    """dhash_images: at 9x8 the pooling grid is the identity, so every
    bit is a direct neighbor comparison; images below the grid and
    undecodable payloads honest-reject to NULL bands."""
    from woe_monotonic_binning_spark.operators.multimodal import dhash_images

    val = lambda x, y: (x * 17 + y * 7) % 256  # noqa: E731
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(_ppm(9, 8, val))),
            (1, "image", bytearray(_ppm(8, 8, val))),   # too narrow
            (2, "image", bytearray(b"not an image")),
            (3, "image", None),
        ],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in dhash_images(media).collect()}
    exp = [0, 0, 0, 0]
    for r in range(8):
        for c in range(8):
            if val(c + 1, r) > val(c, r):
                k = r * 8 + c
                exp[k // 16] |= 1 << (k % 16)
    assert got[0].dhash_bands == exp and got[0].fmt == "ppm"
    assert got[1].dhash_bands is None and got[1].width == 8  # dims report
    assert got[2].dhash_bands is None and got[2].fmt is None
    assert got[3].dhash_bands is None


def test_dhash_scale_and_format_invariance(spark):
    """The perceptual contract: an integer-upscaled copy (every pixel
    2x2-duplicated) and a re-encoded copy (same raster as BMP) hash
    IDENTICALLY — the re-encodes byte-level dedup cannot see."""
    import struct

    from woe_monotonic_binning_spark.operators.multimodal import dhash_images

    val = lambda x, y: (x * 29 + y * 13) % 256  # noqa: E731
    up = lambda x, y: val(x // 2, y // 2)  # noqa: E731

    def bmp(w, h, v):
        stride = (w * 3 + 3) & ~3
        raster = b"".join(
            b"".join(bytes([v(x, y)] * 3) for x in range(w))
            + b"\x00" * (stride - w * 3)
            for y in range(h - 1, -1, -1)
        )
        hdr = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835,
            0, 0,
        )
        return hdr + dib + raster

    media = spark.createDataFrame(
        [
            (0, "image", bytearray(_ppm(9, 8, val))),
            (1, "image", bytearray(_ppm(18, 16, up))),
            (2, "image", bytearray(bmp(9, 8, val))),
        ],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in dhash_images(media).collect()}
    assert got[0].dhash_bands == got[1].dhash_bands
    assert got[0].dhash_bands == got[2].dhash_bands
    assert got[2].fmt == "bmp" and got[1].width == 18


def test_image_neardup_pairs_finds_perturbed_copy(spark):
    """image_neardup_pairs: a one-pixel perturbation moves at most two
    difference bits, so the pair surfaces within the banding guarantee;
    unrelated gradients stay unpaired; undecodable rows take no part."""
    from woe_monotonic_binning_spark.operators.dedup import (
        image_neardup_pairs,
    )

    val = lambda x, y: (x * 23 + y * 11) % 256  # noqa: E731
    tweaked = lambda x, y: 255 if (x, y) == (4, 4) else val(x, y)  # noqa: E731
    other = lambda x, y: (x * 5 + y * 41 + 77) % 256  # noqa: E731
    media = spark.createDataFrame(
        [
            (0, "image", bytearray(_ppm(9, 8, val))),
            (1, "image", bytearray(_ppm(9, 8, tweaked))),
            (2, "image", bytearray(_ppm(9, 8, other))),
            (3, "image", bytearray(b"junk")),
        ],
        "media_id long, kind string, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_neardup_pairs(media, max_hamming=3).collect()
    }
    assert (0, 1) in pairs and 0 < pairs[(0, 1)] <= 2
    assert all(3 not in p for p in pairs)


def test_decode_text_stream_equals_batch(spark, tmp_path):
    """decode_text (incl. hints + cp1252, round 16) is a stateless Arrow
    projection: the SAME call on a Structured Streaming source decodes
    byte-identically to the batch run."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        decode_text,
        synthetic_text_media,
    )

    docs = spark.range(54).withColumnRenamed("id", "doc_id")
    media = synthetic_text_media(docs).select(
        "media_id", "content", "charset_hint"
    )
    src, out, ckpt = (
        str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    media.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(
            "media_id bigint, content binary, charset_hint string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        decode_text(stream, hint_col="charset_hint")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    key = lambda r: r.media_id  # noqa: E731
    got = sorted(spark.read.parquet(out).collect(), key=key)
    exp = sorted(
        decode_text(
            spark.read.parquet(src), hint_col="charset_hint"
        ).collect(),
        key=key,
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in exp]
    # every round-16 codec actually exercised through the stream
    assert {"windows-1252", "latin-1", "utf-8", "utf-16-le"} <= {
        r.encoding for r in got if r.encoding
    }


# -- round 16: perceptual audio hash ------------------------------------------


def _tone_wav(samples, rate=8000):
    data = b"".join(int(v).to_bytes(2, "little", signed=True) for v in samples)
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def _tone_flac(samples):
    """Verbatim-subframe FLAC of the same samples — built with the
    module's CRC helpers (FLAC verifies real checksums)."""
    from woe_monotonic_binning_spark.operators.multimodal import (
        _crc8,
        _crc16,
    )

    n = len(samples)
    streaminfo = (
        bytes([0x80, 0, 0, 34])
        + n.to_bytes(2, "big") * 2
        + b"\x00\x00\x00" * 2
        + bytes([0x01, 0xF4, 0x00, 0xF0])
        + n.to_bytes(4, "big")
        + b"\x00" * 16
    )
    fh = bytes([0xFF, 0xF8, 0x64, 0x08, 0x00, n - 1])  # bs code 6
    fh += bytes([_crc8(fh)])
    body = fh + b"\x02"  # VERBATIM subframe header
    body += b"".join(int(v).to_bytes(2, "big", signed=True) for v in samples)
    body += _crc16(body).to_bytes(2, "big")
    return b"fLaC" + streaminfo + body


def test_ahash_closed_form_and_format_invariance(spark):
    """ahash_audio: 130 samples pool to exactly 2 per window, so every
    bit is a two-term energy comparison; a WAV and a verbatim FLAC of
    the SAME samples hash identically (the re-encode byte-level dedup
    cannot see); too-short and undecodable payloads honest-reject."""
    from woe_monotonic_binning_spark.operators.multimodal import ahash_audio

    samples = [((7 * 31 + t * 17) % 4001) - 2000 for t in range(130)]
    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(_tone_wav(samples))),
            (1, "audio", bytearray(_tone_flac(samples))),
            (2, "audio", bytearray(_tone_wav(samples[:64]))),  # too short
            (3, "audio", bytearray(b"not audio")),
            (4, "audio", None),
        ],
        "media_id long, kind string, content binary",
    )
    got = {r.media_id: r for r in ahash_audio(media).collect()}
    exp = [0, 0, 0, 0]
    e = [samples[2 * j] ** 2 + samples[2 * j + 1] ** 2 for j in range(65)]
    for k in range(64):
        if e[k + 1] > e[k]:
            exp[k // 16] |= 1 << (k % 16)
    assert got[0].ahash_bands == exp and got[0].fmt == "wav"
    assert got[1].ahash_bands == exp and got[1].fmt == "flac"
    assert got[0].n_samples == got[1].n_samples == 130
    assert got[2].ahash_bands is None and got[2].n_samples == 64
    assert got[3].ahash_bands is None and got[3].fmt is None
    assert got[4].ahash_bands is None


def test_audio_neardup_pairs_finds_reencoded_copy(spark):
    """audio_neardup_pairs: a FLAC re-encode pairs with its WAV source
    at hamming 0; a slightly perturbed copy pairs within the banding
    guarantee; an unrelated tone stays unpaired."""
    from woe_monotonic_binning_spark.operators.dedup import (
        audio_neardup_pairs,
    )

    base = [((3 * 31 + t * 17) % 4001) - 2000 for t in range(130)]
    tweaked = list(base)
    tweaked[64] = 2000  # one sample: moves at most two energy bits
    other = [((t * 113) % 3001) - 1500 for t in range(130)]
    media = spark.createDataFrame(
        [
            (0, "audio", bytearray(_tone_wav(base))),
            (1, "audio", bytearray(_tone_flac(base))),
            (2, "audio", bytearray(_tone_wav(tweaked))),
            (3, "audio", bytearray(_tone_wav(other))),
        ],
        "media_id long, kind string, content binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in audio_neardup_pairs(media, max_hamming=3).collect()
    }
    assert pairs.get((0, 1)) == 0
    assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 2
    assert not any(3 in p for p in pairs)


@pytest.fixture(scope="module")
def gram_edge_docs(spark):
    """Edge-case corpus for the round-17 concat_ws gram rewrite: NULL
    text, empty text, whitespace-only, 1 word, exactly n words (n=3),
    n+1 words, repeated grams, and multi-space runs."""
    rows = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "one"),
        (4, "one two"),
        (5, "one two three"),
        (6, "one two three four"),
        (7, "a b a b a b a b"),
        (8, "Tabs\tand\nnewlines   collapse  here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingled_concat_ws_matches_slice_join(spark, docs_with_dups, gram_edge_docs):
    """Round 17: shingled() builds each word n-gram with concat_ws over
    direct element references instead of array_join(slice(...)) — no
    per-gram array allocation.  This pins byte-identical output against
    the old expression (reconstructed verbatim), null-safely, on a real
    corpus AND the edge cases (NULL text, size <= n, duplicates), for
    both the minhash n=3 and the decontamination n=8 shapes."""
    from woe_monotonic_binning_spark.operators.dedup import shingled
    from woe_monotonic_binning_spark.operators.text import WS_CHARS

    for corpus in (docs_with_dups, gram_edge_docs):
        for n in (3, 8):
            normal = F.regexp_replace(
                F.trim(F.lower(F.col("text"))), f"[{WS_CHARS}]+", " "
            )
            old_expr = (
                f"array_distinct(transform(sequence(1, greatest(size(__words), {n}) - {n} + 1), "
                f"i -> array_join(slice(__words, i, {n}), ' ')))"
            )
            old = corpus.select(
                F.col("doc_id"), F.split(normal, " ").alias("__words")
            ).select(F.col("doc_id"), F.expr(old_expr).alias("old_shingles"))
            new = shingled(corpus, "text", "doc_id", n, "word")
            joined = new.join(old, "doc_id")
            assert joined.count() == corpus.count()
            assert (
                joined.filter(F.expr("NOT (shingles <=> old_shingles)")).count() == 0
            ), f"n={n}"


def test_dup_ngram_concat_ws_matches_slice_join(spark, docs_with_dups, gram_edge_docs):
    """Round 17: _dup_ngram_char_frac builds grams with concat_ws instead
    of array_join(slice(...)) — same rewrite as shingled().  Pins the
    final fraction (the certified gopher signal) identical to the old
    gram expression for n in {2, 3, 4} over a real corpus and the edge
    corpus."""
    from woe_monotonic_binning_spark.operators.text import (
        WS_CHARS,
        _dup_ngram_char_frac,
    )

    words = F.split(
        F.regexp_replace(F.trim(F.col("text")), f"[{WS_CHARS}]+", " "), " "
    )
    for corpus in (docs_with_dups, gram_edge_docs):
        base = corpus.select(F.col("doc_id"), words.alias("__gw"))
        for n in (2, 3, 4):
            old_grams = (
                f"transform(sequence(1, greatest(size(__gw), {n}) - {n} + 1), "
                f"i -> array_join(slice(__gw, i, {n}), ' '))"
            )
            old_fold = (
                f"aggregate(array_sort({old_grams}), "
                "named_struct('prev', cast(null as string), 'run', false, "
                "'dup', 0L, 'tot', 0L), "
                "(acc, g) -> named_struct("
                "'prev', g, "
                "'run', acc.prev <=> g, "
                "'dup', acc.dup + IF(acc.prev <=> g, "
                "cast(length(g) as bigint) + IF(acc.run, 0L, cast(length(acc.prev) as bigint)), 0L), "
                "'tot', acc.tot + cast(length(g) as bigint)), "
                "acc -> round(acc.dup / greatest(acc.tot, 1L), 6))"
            )
            both = base.select(
                "doc_id",
                F.expr(old_fold).alias("old_frac"),
                _dup_ngram_char_frac(n).alias("new_frac"),
            )
            assert (
                both.filter(F.expr("NOT (old_frac <=> new_frac)")).count() == 0
            ), f"n={n}"


def test_match_counters_regexp_count_parity(spark, docs_with_dups, gram_edge_docs):
    """Round 17: word_count / token_count_bpe / stopword_count / the
    scrub_pii per-kind counters use regexp_count instead of
    size(regexp_extract_all(...)).  Same counts by definition (same
    engine, same non-overlapping match walk, NULL-in NULL-out) — pinned
    here against the old expression on a real corpus and the edge corpus."""
    from woe_monotonic_binning_spark.operators.text import (
        LANG_MARKERS,
        PII_PATTERNS,
        _BPE_RE,
        _WORD_RE,
        stopword_count,
        token_count_bpe,
        word_count,
    )

    t = F.col("text")
    stop_pat = "\\b(" + "|".join(LANG_MARKERS["en"]) + ")\\b"
    pii_text = spark.createDataFrame(
        [
            (100, "mail a@b.com and 10.0.0.1 call (555) 867-5309 or 555-867-5309"),
            (101, None),
        ],
        "doc_id long, text string",
    )
    for corpus in (docs_with_dups, gram_edge_docs, pii_text):
        checks = [
            word_count(t).eqNullSafe(
                F.size(F.regexp_extract_all(t, F.lit(_WORD_RE), F.lit(0)))
            ),
            token_count_bpe(t).eqNullSafe(
                F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), F.lit(0)))
            ),
            stopword_count(t, LANG_MARKERS["en"]).eqNullSafe(
                F.size(F.regexp_extract_all(F.lower(t), F.lit(stop_pat), F.lit(0)))
            ),
        ] + [
            F.regexp_count(t, F.lit(pat)).eqNullSafe(
                F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
            )
            for pat in PII_PATTERNS.values()
        ]
        agree = corpus.select(
            *[c.alias(f"c{i}") for i, c in enumerate(checks)]
        )
        bad = agree.filter(
            ~F.expr(" AND ".join(f"c{i}" for i in range(len(checks))))
        ).count()
        assert bad == 0


def test_tfidf_dfreq_when_guard_parity(spark, docs_with_dups):
    """Round 17: tfidf_top_terms counts document frequency with
    count(when(tf > 0, 1)) so the tf subtree stays canonically identical
    across both join branches and AQE reuses the tokenize shuffle stage
    (one corpus pass, not two).  tf = count(*) >= 1, so values are
    unchanged — pinned against the plain count(*) form here, and the
    executed plan is asserted to actually share the stage (one fewer
    Generate subtree than the unshared form)."""
    from pyspark.sql.window import Window

    from woe_monotonic_binning_spark.operators.text import tfidf_top_terms

    def old_form(df, top_k=3, min_len=3):
        toks = df.select(
            F.col("doc_id"),
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
        ).filter(F.length("term") >= min_len)
        tf = toks.groupBy("doc_id", "term").agg(
            F.count("*").cast("double").alias("tf")
        )
        dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
        n = df.select(F.count("*").cast("double").alias("__n"))
        scored = (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(n))
            .select(
                "doc_id",
                "term",
                F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6).alias(
                    "tfidf"
                ),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= top_k)
            .select("doc_id", "term", "tfidf", "rank")
        )

    new = tfidf_top_terms(docs_with_dups)
    old = old_form(docs_with_dups)
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    # the executed plan must actually share the tokenize stage: the old
    # form prints its Generate subtree once per branch, the new form one
    # fewer (the reused stage prints as a reference).  Asserted on a
    # parquet-backed corpus — the bench/production shape — because a
    # CACHED source (InMemoryTableScan leaves, e.g. the docs_with_dups
    # fixture) defeats the canonical match and both forms then read the
    # cache once per branch anyway.
    pq = docs_with_dups.sparkSession.read.parquet(
        "/root/testdata/sf0.01/documents.parquet"
    )
    new_pq, old_pq = tfidf_top_terms(pq), old_form(pq)
    new_pq.collect()
    old_pq.collect()
    new_plan = new_pq._jdf.queryExecution().executedPlan().toString()
    old_plan = old_pq._jdf.queryExecution().executedPlan().toString()
    assert new_plan.count("Generate explode") < old_plan.count("Generate explode")
