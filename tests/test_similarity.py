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
