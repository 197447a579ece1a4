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
    # Guard: docs with < n tokens have no shingles.  Without the guard,
    # sequence(0, negative) yields a DESCENDING sequence and slice(start=0)
    # throws INVALID_PARAMETER_VALUE.START at runtime on short docs (the
    # DuckDB oracle's generate_series(1, len-2) silently yields none).
    sh = F.expr(
        f"CASE WHEN size(split(text, ' ')) >= {n} THEN "
        f"transform(sequence(0, size(split(text, ' ')) - {n}), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i + 1, {n}))) "
        f"ELSE CAST(array() AS array<string>) END"
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


def passage_dedup(df: DataFrame, chunk: int = 8) -> DataFrame:
    """Passage-level exact dedup: the boilerplate/template detector.

    Each doc's token stream is cut into consecutive ``chunk``-token
    windows (stride = chunk, partial tail dropped); each window is
    fingerprinted (md5 over the space-joined tokens) and fingerprints
    occurring more than once are reported with their spread.  This is
    the exact-substring dedup pass of the training-data literature
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better") re-expressed in the shuffle-friendly aligned-chunk shape:
    one explode + one partial-agg groupBy on the 16-byte digest — no
    suffix array, no cross-doc comparison, scale-safe at 10^12 docs.

    Output: (chunk_hash, n_docs, n_occurrences, canonical_doc_id).
    """
    toks = F.split(F.col("text"), " ")
    n_chunks = F.floor(F.size(toks) / chunk).cast("int")
    # guard: sequence(0, -1) yields a DESCENDING sequence on Spark, so
    # chunkless docs must map to an empty array, not sequence()
    hashes = F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i * chunk + 1, chunk))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        df.select("doc_id", F.explode(hashes).alias("chunk_hash"))
        .groupBy("chunk_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occurrences"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


def connected_components(
    pairs: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Near-dup cluster assignment: (doc_id, cluster_id, n_members) for
    every doc appearing in >= 1 candidate pair, where ``cluster_id`` is
    the minimum doc_id of the connected component — the canonical-doc
    step every production dedup pipeline runs after pair generation
    (keep cluster_id, drop the rest).

    Iterative min-label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converged when no
    label changes.  Rounds needed = graph diameter, and LSH/simhash dup
    components are near-cliques (diameter 2-3 in practice), so this
    terminates in a handful of rounds; the O(log n) large-star/small-star
    variant is the upgrade path if adversarial chain-shaped components
    ever appear.  Each round is one equi-join + one groupBy on doc_id —
    shuffle sized by the *edge* set, never all-pairs; lineage is
    truncated per round (localCheckpoint) so plan cost stays flat.
    """
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        nb = edges.join(
            labels.select(F.col("doc_id").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("doc_id"), "label")
        new = (
            labels.unionByName(nb)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "doc_id")
            .filter(F.col("label") < F.col("old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    else:
        raise RuntimeError(f"not converged after {max_rounds} rounds")
    sizes = labels.groupBy("label").agg(F.count("*").alias("n_members"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_id"), "n_members"
    )


def connected_components_star(
    pairs: DataFrame, max_rounds: int = 30
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds even on adversarial chain/path
    components where plain min-label propagation needs diameter rounds.
    Same output contract as :func:`connected_components`:
    (doc_id, cluster_id, n_members), cluster_id = component min.

    large-star: every node u links each *strictly larger* neighbor to
    m(u) = min(N(u) ∪ {u}); small-star: every node u links each
    neighbor <= u (and itself) to m(u).  Both operations preserve
    connectivity exactly; iterating them contracts every component to a
    star centered on its minimum.

    Each star step is shuffle-based: m(u) comes from a plain
    ``groupBy(u).min(v)`` (partial-agg friendly) joined back onto the
    edge set — the per-node neighborhood is never materialized into a
    single row (a ``collect_set`` neighborhood for a crawl-scale hub
    node is exactly the row that blows single-row / 2 GB array limits,
    defeating the point of large-star).  Shuffles are sized by the
    current edge set; this is the default cluster assigner for
    ``dedup_clusters``.
    """
    e = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    nodes = (
        e.select(F.col("u").alias("doc_id"))
        .unionByName(e.select(F.col("v").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # undirected edge set, kept as u < v canonical rows
    edges = (
        e.select(F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(edges: DataFrame, large: bool) -> DataFrame:
        both = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        # m(u) = min(N(u) ∪ {u}): min-agg + join, never a per-node set
        mins = (
            both.groupBy("u")
            .agg(F.min("v").alias("_nbr_min"))
            .select("u", F.least("_nbr_min", "u").alias("m"))
        )
        if large:
            # link each strictly-larger neighbor to m(u); m(u) <= u < v
            targets = both.filter(F.col("v") > F.col("u"))
        else:
            # link each neighbor <= u, and u itself, to m(u)
            targets = both.filter(F.col("v") <= F.col("u")).unionByName(
                mins.select("u", F.col("u").alias("v"))
            )
        return (
            targets.join(mins, "u")
            .filter(F.col("m") != F.col("v"))
            .select(
                F.least("m", "v").alias("u"), F.greatest("m", "v").alias("v")
            )
            .distinct()
        )

    for _ in range(max_rounds):
        edges2 = _star(_star(edges, large=True), large=False).localCheckpoint(
            eager=True
        )
        # converged when every edge points at a component min: the edge
        # set is then a star forest and one more pass is a fixpoint
        diff = (
            edges2.exceptAll(edges).limit(1).count()
            + edges.exceptAll(edges2).limit(1).count()
        )
        edges = edges2
        if diff == 0:
            break
    else:
        raise RuntimeError(f"not converged after {max_rounds} rounds")

    labels = (
        nodes.join(
            edges.select(F.col("v").alias("doc_id"), F.col("u").alias("label")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id", F.coalesce("label", F.col("doc_id")).alias("label")
        )
    )
    sizes = labels.groupBy("label").agg(F.count("*").alias("n_members"))
    return labels.join(sizes, "label").select(
        "doc_id", F.col("label").alias("cluster_id"), "n_members"
    )


def simhash(df: DataFrame, bits: int = 64) -> DataFrame:
    """(doc_id, sim_hi, sim_lo): md5-bit majority vote over distinct
    tokens, split into two non-negative 32-bit halves.

    bit j of a token = bit (3 - j%4) of hex digit j//4 of md5(token);
    fingerprint bit j set iff the +1/-1 vote sum over tokens is > 0.
    Two BIGINT halves (hi = bits 32..63, lo = bits 0..31) keep every
    shift < 32, so neither engine hits signed-shift/overflow semantics
    at the full 64-bit default (1<<63 overflows DuckDB BIGINT and goes
    negative in Spark).  64 bits is the scale default: 16-bit
    fingerprints give only 65k distinct buckets — useless at billions
    of docs.  Pure string/arithmetic ops — engine-portable."""
    assert 1 <= bits <= 64
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
    set_bit = F.col("v") > 0
    lo = F.sum(
        F.when(set_bit & (F.col("j") < 32),
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT))"))
        .otherwise(0)
    )
    hi = F.sum(
        F.when(set_bit & (F.col("j") >= 32),
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j AS INT) - 32)"))
        .otherwise(0)
    )
    return (
        votes.groupBy("doc_id", "j")
        .agg(F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("v"))
        .groupBy("doc_id")
        .agg(hi.cast("long").alias("sim_hi"), lo.cast("long").alias("sim_lo"))
    )


def simhash_hamming_pairs(sh: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Near-dup pairs with hamming(fingerprint) <= max_hamming, as a
    banded EQUI-join — never an all-pairs theta join.

    Pigeonhole: the 64 bits are cut into 4 contiguous 16-bit bands; at
    most ``max_hamming`` (<= 3) bands can contain a differing bit, so
    every qualifying pair agrees exactly on >= 1 band.  Candidate
    generation = explode to (band_idx, band_bits) + hash equi-join
    (shuffle sized like MinHash LSH), then the exact hamming verify.
    Result set is provably identical to the all-pairs scan.

    Input: (doc_id, sim_hi, sim_lo).  Output: (doc_a, doc_b, hamming).
    """
    assert max_hamming <= 3, "4 fixed bands guarantee recall only to 3"
    mask = F.lit(0xFFFF).cast("bigint")
    bands = sh.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band_idx"),
                         F.shiftright("sim_hi", 16).alias("band_bits")),
                F.struct(F.lit(1).alias("band_idx"),
                         F.col("sim_hi").bitwiseAND(mask).alias("band_bits")),
                F.struct(F.lit(2).alias("band_idx"),
                         F.shiftright("sim_lo", 16).alias("band_bits")),
                F.struct(F.lit(3).alias("band_idx"),
                         F.col("sim_lo").bitwiseAND(mask).alias("band_bits")),
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_bits")
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band_bits")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band_bits")
    cand = (
        a.join(b, ["band_idx", "band_bits"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    fa = sh.select(F.col("doc_id").alias("doc_a"),
                   F.col("sim_hi").alias("ha_hi"), F.col("sim_lo").alias("ha_lo"))
    fb = sh.select(F.col("doc_id").alias("doc_b"),
                   F.col("sim_hi").alias("hb_hi"), F.col("sim_lo").alias("hb_lo"))
    ham = (
        F.bit_count(F.col("ha_hi").bitwiseXOR(F.col("hb_hi")))
        + F.bit_count(F.col("ha_lo").bitwiseXOR(F.col("hb_lo")))
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
