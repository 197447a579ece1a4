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


def ivf_assign(df: DataFrame, n_centroids: int = 8) -> DataFrame:
    """IVF coarse quantizer: deterministic centroids (the first
    ``n_centroids`` vectors by vec_id — a seed-free, engine-portable
    stand-in for a k-means codebook), each vector assigned to the
    centroid with the highest quantized inner product (ties -> lowest
    centroid id).  Output: (vec_id, centroid_id)."""
    q = quantized(df).select("vec_id", "qvec")
    cents = q.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("qvec").alias("cvec")
    )
    dot = F.aggregate(
        F.zip_with("qvec", "cvec", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("cid").asc()
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn("dot", dot)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("centroid_id"))
    )


def ivf_topk(df: DataFrame, k: int = 5, n_centroids: int = 8) -> DataFrame:
    """IVF-bucketed approximate top-k: each query searches only its own
    centroid's bucket (nprobe=1).  The scale path: candidate generation
    is an equi-join on centroid_id instead of a full cross join.
    Output: (qid, pid, rank) by quantized inner product."""
    assign = ivf_assign(df, n_centroids)
    q = quantized(df).select("vec_id", "qvec")
    withc = q.join(assign, "vec_id")
    a = withc.select(
        F.col("vec_id").alias("qid"), F.col("qvec").alias("qv"), "centroid_id"
    )
    b = withc.select(
        F.col("vec_id").alias("pid"), F.col("qvec").alias("pv"), "centroid_id"
    )
    dot = F.aggregate(
        F.zip_with("qv", "pv", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("pid").asc())
    return (
        a.join(b, "centroid_id")
        .filter(F.col("qid") != F.col("pid"))
        .withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "pid", F.col("rank").cast("int").alias("rank"))
    )


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.9) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b), decided EXACTLY on
    quantized integers: cos(a,b) >= t  <=>  dot > 0 and
    dot^2 >= t^2 * |a|^2 * |b|^2 — evaluated in DECIMAL(38,0) to avoid
    float ties, so both engines agree bit-for-bit."""
    q = quantized(df).select("vec_id", "qvec")
    norm2 = F.aggregate(
        F.transform("qvec", lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qn = q.withColumn("n2", norm2)
    a = qn.select(F.col("vec_id").alias("vec_a"), F.col("qvec").alias("va"),
                  F.col("n2").alias("na"))
    b = qn.select(F.col("vec_id").alias("vec_b"), F.col("qvec").alias("vb"),
                  F.col("n2").alias("nb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    # t = threshold scaled to integer hundredths: t2_num / t2_den
    t2_num = int(round(threshold * 100)) ** 2
    lhs = (F.col("dot").cast("decimal(38,0)") * F.col("dot")).cast(
        "decimal(38,0)"
    ) * F.lit(10000).cast("decimal(38,0)")
    rhs = (
        F.col("na").cast("decimal(38,0)") * F.col("nb")
    ).cast("decimal(38,0)") * F.lit(t2_num).cast("decimal(38,0)")
    return (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("dot", dot)
        .filter((F.col("dot") > 0) & (lhs >= rhs))
        .select("vec_a", "vec_b")
    )
