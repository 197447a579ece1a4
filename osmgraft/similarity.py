"""Similarity search over embedding columns.

* brute-force top-k (exact baseline) — quantized integer dot products
  for deterministic cross-engine ranking (see queries.ann_topk);
* random-hyperplane LSH bucketing — the scale path: each vector hashes
  to a small bucket key; candidate generation is an equi-join on the
  bucket, turning the O(n^2) similarity scan into a bucketed join
  (IVF-style).  Hyperplanes are deterministic integer lattices so both
  engines agree bit-for-bit.
* float cosine top-k via F.aggregate/zip_with (JVM-side fold) for the
  production path where cross-engine bit-equality is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

DIM = 64
N_PLANES = 8


def quantized(df: DataFrame, col: str = "embedding") -> DataFrame:
    """array<float> -> array<bigint> at 1e3 scale (exact cross-engine)."""
    q = F.transform(col, lambda x: F.round(x.cast("double") * 1000).cast("bigint"))
    return df.withColumn("qvec", q)


def _plane_coeff(i: int, d: int) -> int:
    return ((i * 1009 + d * 9176) % 97) - 48


def lsh_buckets(df: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, bucket): sign pattern of n_planes deterministic integer
    hyperplanes over the quantized embedding."""
    qdf = quantized(df)
    bucket = F.lit(0)
    for i in range(n_planes):
        coeffs = F.array(*[F.lit(_plane_coeff(i, d)) for d in range(DIM)])
        dot = F.aggregate(
            F.zip_with("qvec", coeffs, lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i)).otherwise(0)
    return qdf.select("vec_id", bucket.cast("int").alias("bucket"))


def lsh_candidate_pairs(df: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """Candidate pairs sharing an LSH bucket (a < b)."""
    b = lsh_buckets(df, n_planes)
    a = b.select(F.col("vec_id").alias("vec_a"), "bucket")
    c = b.select(F.col("vec_id").alias("vec_b"), "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "bucket")
    )


def cosine_topk(
    queries: DataFrame, points: DataFrame, k: int = 10
) -> DataFrame:
    """Float cosine top-k (production path; JVM fold, broadcast probe).

    queries(qid, embedding), points(pid, embedding) ->
    (qid, pid, rank, cosine)."""
    q = queries.select(
        F.col("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    p = points.select(
        F.col("pid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pe"),
    )
    dot = F.aggregate(
        F.zip_with("qe", "pe", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("pid").asc()
    )
    return (
        q.crossJoin(F.broadcast(p))
        .withColumn("cosine", dot / (norm(F.col("qe")) * norm(F.col("pe"))))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", "rank", "cosine")
    )
