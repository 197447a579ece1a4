"""Deduplication operators for web-scale corpora.

Four tiers, all shuffle-conscious:

* **exact**     — content-hash groupBy (map-side combine; the only
                  shuffle is on the 16-byte digest).
* **n-gram Jaccard** — exact word-shingle similarity for candidate
                  pairs that share at least one shingle (the shingle
                  equi-join IS the prefilter; no O(n^2) pair scan).
* **MinHash + LSH** — k md5-minwise signatures, banded into LSH keys;
                  only pairs sharing a band collide.  Hashing is done in
                  the *string* domain (lexicographic min over md5 hex)
                  so results are bit-identical across engines — no
                  engine-specific hash function anywhere.
* **SimHash**   — per-token md5 bit votes folded into a compact
                  fingerprint; equal fingerprints = near-dup bucket.

At 10^12-document scale the shingle join is the dominant shuffle; the
band/bucket keys are designed to be low-cardinality-skew-resistant
(md5-uniform), and every aggregation is a partial-agg-friendly
groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TOKEN_SPLIT = " "


def tokens_col(text: str = "text") -> "F.Column":
    return F.split(F.col(text), TOKEN_SPLIT)


def shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per doc: (id, shingle)."""
    toks = tokens_col()
    sh = F.expr(
        f"transform(sequence(0, size(split(text, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i + 1, {n})))"
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .distinct()
    )


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.groupBy(F.md5(F.col(text_col)).alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id")
    )


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.05
) -> DataFrame:
    """Exact Jaccard over word n-gram shingle sets for every pair of
    docs sharing >= 1 shingle.  Output: (doc_a, doc_b, n_inter, n_union,
    jaccard) with doc_a < doc_b."""
    sh = shingles(df, n).cache()
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.withColumnRenamed("id", "doc_a")
    b = sh.withColumnRenamed("id", "doc_b")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "doc_a")
                   .withColumnRenamed("n_sh", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("id", "doc_b")
              .withColumnRenamed("n_sh", "sb"), "doc_b")
        .withColumn("n_union", F.col("sa") + F.col("sb") - F.col("n_inter"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double") / F.col("n_union"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame, k: int = 8, n: int = 3
) -> DataFrame:
    """(id, seed, minhash): k md5-minwise hashes per doc over its
    shingle set — min is lexicographic over fixed-width hex, identical
    in any engine."""
    sh = shingles(df, n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    return (
        sh.select("id", "shingle", seeds)
        .withColumn(
            "h",
            F.md5(
                F.concat(
                    F.col("seed").cast("string"), F.lit("|"), F.col("shingle")
                )
            ),
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame, k: int = 8, band_size: int = 2, n: int = 3
) -> DataFrame:
    """Candidate near-dup pairs sharing >= 1 LSH band, with their
    estimated similarity (fraction of matching minhashes).
    Output: (doc_a, doc_b, n_match, est_sim)."""
    sig = minhash_signatures(df, k, n).cache()
    bands = (
        sig.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(F.concat_ws("#", F.sort_array(F.collect_list(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("minhash"))
        ))).alias("band_key"))
    )
    a = bands.select(F.col("id").alias("doc_a"), "band", "band_key")
    b = bands.select(F.col("id").alias("doc_b"), "band", "band_key")
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sa = sig.select(F.col("id").alias("doc_a"), "seed",
                    F.col("minhash").alias("ma"))
    sb = sig.select(F.col("id").alias("doc_b"), "seed",
                    F.col("minhash").alias("mb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "seed"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("ma") == F.col("mb"), 1).otherwise(0)
            ).alias("n_match")
        )
        .withColumn("est_sim", F.col("n_match").cast("double") / k)
        .select("doc_a", "doc_b", "n_match", "est_sim")
    )


def simhash(df: DataFrame, bits: int = 16) -> DataFrame:
    """(doc_id, simhash): md5-bit majority vote over distinct tokens.

    bit j of a token = bit (3 - j%4) of hex digit j//4 of md5(token);
    fingerprint bit j set iff the +1/-1 vote sum over tokens is > 0.
    Pure string/arithmetic ops — engine-portable."""
    tok = (
        df.select("doc_id", F.explode(tokens_col()).alias("tok"))
        .distinct()
        .withColumn("h", F.md5("tok"))
    )
    votes = tok.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("j"),
        "h",
    ).withColumn(
        "bit",
        F.expr(
            "shiftright(CAST(instr('0123456789abcdef', "
            "substring(h, CAST(j / 4 AS INT) + 1, 1)) - 1 AS INT), "
            "3 - CAST(j % 4 AS INT)) & 1"
        ),
    )
    return (
        votes.groupBy("doc_id", "j")
        .agg(F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("v"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("v") > 0,
                    F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"),
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
        .select("doc_id", F.col("simhash").cast("long").alias("simhash"))
    )
