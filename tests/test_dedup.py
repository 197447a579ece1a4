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
