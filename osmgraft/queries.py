"""Operator registry: every SURVEY.md §2 operator as a (Spark, oracle-SQL)
pair for the driver's DuckDB correctness gate.

Each ``QUERIES[name]`` callable takes ``(spark, sf_dir)`` and returns a
DataFrame; ``ORACLES[name]`` is equivalent SQL DuckDB runs over the same
parquet (views: region nation customer supplier part orders lineitem
events documents embeddings).  Column names and value types are aligned
exactly — aggregates on money columns go through DECIMAL so both engines
produce bit-identical doubles; geometry is pure int64 in both.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import cells, synth
from .join import knn, spatial_join

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Geo: derivation, cells, tiles, spatial join, kNN
# ---------------------------------------------------------------------------

_PTS = synth.points_sql("documents")

_CELL_LEVEL = 9
_CELL_N = 1 << _CELL_LEVEL
_LEVEL_K = 1 << 52
_Y_K = 1 << 26


@_register(
    "geo_entities",
    f"SELECT doc_id, ent_idx, name, lon_e7, lat_e7 FROM ({_PTS})",
)
def geo_entities(spark, sf_dir):
    """Deterministic geo-entity derivation (parse-stage analog)."""
    return synth.geo_entities_df(spark, sf_dir).select(
        "doc_id", "ent_idx", "name", "lon_e7", "lat_e7"
    )


@_register(
    "geo_cell_assign",
    f"""
    WITH pts AS ({_PTS})
    SELECT CAST({_CELL_LEVEL} * {_LEVEL_K}
         + (((lat_e7 + 1800000000) * {_CELL_N}) // 3600000000) * {_Y_K}
         + ((lon_e7 + 1800000000) * {_CELL_N}) // 3600000000 AS BIGINT) AS cell,
           COUNT(*) AS n_points
    FROM pts GROUP BY 1
    """,
)
def geo_cell_assign(spark, sf_dir):
    """H3-style cell encode (pure JVM int math) + per-cell counts."""
    pts = synth.geo_entities_df(spark, sf_dir)
    return (
        pts.withColumn(
            "cell",
            cells.lonlat_cell_col(F.col("lon_e7"), F.col("lat_e7"), _CELL_LEVEL),
        )
        .groupBy("cell")
        .agg(F.count("*").alias("n_points"))
    )


_MERC_SQL = (
    "CASE WHEN 10000000.0 * (180.0/pi()) * ln(tan(pi()/4.0 + (lat_e7/10000000.0) * (pi()/180.0) / 2.0)) >= 0 "
    "THEN floor(10000000.0 * (180.0/pi()) * ln(tan(pi()/4.0 + (lat_e7/10000000.0) * (pi()/180.0) / 2.0)) + 0.5) "
    "ELSE ceil(10000000.0 * (180.0/pi()) * ln(tan(pi()/4.0 + (lat_e7/10000000.0) * (pi()/180.0) / 2.0)) - 0.5) END"
)


@_register(
    "geo_tile_assign",
    f"""
    WITH pts AS ({_PTS}),
    m AS (SELECT doc_id, ent_idx, lon_e7,
                 CAST({_MERC_SQL} AS BIGINT) AS my FROM pts)
    SELECT doc_id, ent_idx,
           CAST(12 AS INT) AS z,
           CAST(GREATEST(0, LEAST(4095, ((lon_e7 + 1800000000) * 4096) // 3600000000)) AS BIGINT) AS tile_x,
           CAST(GREATEST(0, LEAST(4095, ((my + 1800000000) * 4096) // 3600000000)) AS BIGINT) AS tile_y
    FROM m
    """,
)
def geo_tile_assign(spark, sf_dir):
    """Reference tile addressing at z=12 (mercator y, osmc/mapper.c:28-34)."""
    pts = synth.geo_entities_df(spark, sf_dir)
    tx, ty = cells.mercator_tile_cols(F.col("lon_e7"), F.col("lat_e7"), 12)
    return pts.select(
        "doc_id",
        "ent_idx",
        F.lit(12).cast("int").alias("z"),
        tx.alias("tile_x"),
        ty.alias("tile_y"),
    )


def _pip_oracle_sql() -> str:
    segs = synth.segments_sql_values()
    empties = synth.empty_boundary_ids()
    empty_union = "\n".join(
        f"UNION ALL SELECT doc_id, ent_idx, CAST({b} AS BIGINT) AS boundary_id FROM pts"
        for b in empties
    )
    return f"""
    WITH pts AS ({_PTS}),
    segs_raw(boundary_id, p0x, p0y, p1x, p1y) AS (VALUES {segs}),
    segs AS (
      SELECT CAST(boundary_id AS BIGINT) AS boundary_id,
             CAST(p0x AS BIGINT) AS p0x, CAST(p0y AS BIGINT) AS p0y,
             CAST(p1x AS BIGINT) AS p1x, CAST(p1y AS BIGINT) AS p1y
      FROM segs_raw),
    bbox AS (
      SELECT boundary_id,
             MIN(LEAST(p0x, p1x)) AS minx, MIN(LEAST(p0y, p1y)) AS miny,
             MAX(GREATEST(p0x, p1x)) AS maxx, MAX(GREATEST(p0y, p1y)) AS maxy
      FROM segs GROUP BY 1),
    cand AS (
      SELECT p.doc_id, p.ent_idx, s.boundary_id,
        CASE
          WHEN (p.lon_e7 = s.p0x AND p.lat_e7 = s.p0y)
            OR (p.lon_e7 = s.p1x AND p.lat_e7 = s.p1y) THEN 2
          WHEN ((s.p1x - s.p0x) * (p.lat_e7 - s.p0y)
              - (p.lon_e7 - s.p0x) * (s.p1y - s.p0y)) > 0 THEN
            CASE WHEN s.p0y < p.lat_e7 AND p.lat_e7 <= s.p1y THEN 1 ELSE 0 END
          WHEN ((s.p1x - s.p0x) * (p.lat_e7 - s.p0y)
              - (p.lon_e7 - s.p0x) * (s.p1y - s.p0y)) < 0 THEN
            CASE WHEN s.p1y < p.lat_e7 AND p.lat_e7 <= s.p0y THEN 1 ELSE 0 END
          ELSE
            CASE WHEN (s.p1x - s.p0x) * (p.lon_e7 - s.p0x) < 0
                   OR (s.p1y - s.p0y) * (p.lat_e7 - s.p0y) < 0 THEN 0
                 WHEN (s.p1x - s.p0x) * (s.p1x - s.p0x) + (s.p1y - s.p0y) * (s.p1y - s.p0y)
                    < (p.lon_e7 - s.p0x) * (p.lon_e7 - s.p0x) + (p.lat_e7 - s.p0y) * (p.lat_e7 - s.p0y) THEN 0
                 ELSE 2 END
        END AS et
      FROM pts p
      JOIN bbox b ON p.lon_e7 BETWEEN b.minx AND b.maxx
                 AND p.lat_e7 BETWEEN b.miny AND b.maxy
      JOIN segs s ON s.boundary_id = b.boundary_id),
    agg AS (
      SELECT doc_id, ent_idx, boundary_id,
             MAX(CASE WHEN et = 2 THEN 1 ELSE 0 END) AS touched,
             SUM(CASE WHEN et = 1 THEN 1 ELSE 0 END) % 2 AS par
      FROM cand GROUP BY 1, 2, 3)
    SELECT doc_id, ent_idx, CAST(boundary_id AS BIGINT) AS boundary_id
    FROM agg WHERE touched = 1 OR par = 1
    {empty_union}
    """


@_register("geo_pip_join", _pip_oracle_sql())
def geo_pip_join(spark, sf_dir):
    """Flagship: cell-prefiltered ray-cast point-in-polygon spatial join."""
    pts = synth.geo_entities_df(spark, sf_dir)
    return spatial_join(spark, pts, synth.boundaries()).select(
        "doc_id", "ent_idx", "boundary_id"
    )


@_register(
    "geo_knn",
    f"""
    WITH pts AS ({_PTS}),
    p AS (SELECT doc_id * 10 + ent_idx AS pid, lon_e7, lat_e7 FROM pts),
    q AS (SELECT pid AS qid, lon_e7 AS qx, lat_e7 AS qy FROM p WHERE pid < 300)
    SELECT qid, pid, CAST(rank AS INT) AS rank FROM (
      SELECT q.qid, p.pid,
             ROW_NUMBER() OVER (
               PARTITION BY q.qid
               ORDER BY CAST(p.lon_e7 - q.qx AS HUGEINT) * (p.lon_e7 - q.qx)
                      + CAST(p.lat_e7 - q.qy AS HUGEINT) * (p.lat_e7 - q.qy),
                        p.pid) AS rank
      FROM q CROSS JOIN p)
    WHERE rank <= 5
    """,
)
def geo_knn(spark, sf_dir):
    """kNN via k-ring expansion + exact integer distance refinement."""
    pts = synth.geo_entities_df(spark, sf_dir).select(
        (F.col("doc_id") * 10 + F.col("ent_idx")).alias("pid"), "lon_e7", "lat_e7"
    )
    qs = pts.filter(F.col("pid") < 300).select(
        F.col("pid").alias("qid"), "lon_e7", "lat_e7"
    )
    return knn(spark, qs, pts, k=5).select(
        "qid", "pid", F.col("rank").cast("int").alias("rank")
    )


# ---------------------------------------------------------------------------
# Relational core: agg / join / window / anti-join (DuckDB-oracle checked)
# ---------------------------------------------------------------------------


@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_base,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))
                  * CAST(1 - l_discount AS DECIMAL(5,2))) AS DOUBLE) AS sum_disc,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped aggregation; DECIMAL-exact money sums."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base"),
        F.sum(price * disc).cast("double").alias("sum_disc"),
        (
            F.sum(F.col("l_quantity").cast("bigint")).cast("double") / F.count("*")
        ).alias("avg_qty"),
        F.count("*").alias("n"),
    )


@_register(
    "segment_revenue",
    """
    SELECT c.c_mktsegment,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(15,2))
                  * CAST(1 - l.l_discount AS DECIMAL(5,2))) AS DOUBLE) AS revenue,
           COUNT(DISTINCT o.o_orderkey) AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_mktsegment
    """,
)
def segment_revenue(spark, sf_dir):
    """3-way join (broadcast dims) + exact revenue agg per segment."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(5,2)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(price * disc).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_register(
    "events_latest_per_user",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def events_latest_per_user(spark, sf_dir):
    """Latest-version-wins window dedup (the diff-apply U3 pattern)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


@_register(
    "orders_no_bigqty",
    """
    SELECT o.o_orderkey, o.o_orderstatus FROM orders o
    WHERE NOT EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def orders_no_bigqty(spark, sf_dir):
    """Anti-join (the cascade-delete T4 pattern)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_quantity") > 45
    )
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


# ---------------------------------------------------------------------------
# Training-data ops: dedup, text stats, ANN
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS fingerprint, COUNT(*) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (hash-groupBy; map-side combine)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.groupBy(F.md5(F.col("text")).alias("fingerprint")).agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id")
    )


@_register(
    "doc_token_stats",
    """
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
           CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')) AS uniq_ratio
    FROM documents
    """,
)
def doc_token_stats(spark, sf_dir):
    """Token counting + lexical-diversity quality signal (JVM-side)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("uniq_ratio"),
    )


@_register(
    "ann_topk",
    """
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    qi AS (SELECT vec_id, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS qv
           FROM q, UNNEST(range(1, 65)) AS t(i)),
    pi AS (SELECT vec_id, i, CAST(round(CAST(embedding[i] AS DOUBLE) * 1000) AS BIGINT) AS pv
           FROM embeddings, UNNEST(range(1, 65)) AS t(i)),
    dots AS (
      SELECT qi.vec_id AS qid, pi.vec_id AS pid, SUM(qi.qv * pi.pv) AS dot
      FROM qi JOIN pi ON qi.i = pi.i GROUP BY 1, 2)
    SELECT qid, pid, CAST(rank AS INT) AS rank FROM (
      SELECT qid, pid,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dot DESC, pid) AS rank
      FROM dots WHERE qid <> pid)
    WHERE rank <= 10
    """,
)
def ann_topk(spark, sf_dir):
    """Brute-force top-k inner-product search over quantized embeddings
    (int dot products -> bit-exact cross-engine ranking)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = F.transform(
        "embedding", lambda x: F.round(x.cast("double") * 1000).cast("bigint")
    )
    ev = e.select("vec_id", qvec.alias("qv"))
    q = ev.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qemb")
    )
    p = ev.select(F.col("vec_id").alias("pid"), F.col("qv").alias("pemb"))
    dot = F.aggregate(
        F.zip_with("qemb", "pemb", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("pid").asc())
    return (
        q.crossJoin(F.broadcast(p))
        .filter(F.col("qid") != F.col("pid"))
        .withColumn("dot", dot)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("qid", "pid", F.col("rank").cast("int").alias("rank"))
    )
