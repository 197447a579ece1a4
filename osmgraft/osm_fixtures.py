"""Deterministic OSM-style entity fixtures derived from the driver tables.

The reference's entity model (nodes/ways/relations with tag maps,
``osmc/osm.h:41-109``) is synthesized arithmetically from the read-only
star-schema parquet so every classification / zoom / membership operator
has a DuckDB-expressible oracle:

* **nodes**  <- ``documents``: node id = doc_id, coords = the synth point
  derivation, tags from ``doc_id % 14`` covering every branch of the
  point classifier (``osmc/mapper.c:545-567``) and zoom table
  (``osmc/mapper.c:235-265``).
* **ways**   <- ``orders`` + ``lineitem``: way id = o_orderkey, ordered
  node refs = l_partkey by l_linenumber (the sequence_id ordering
  contract, ``osmc/olm.c:201-209``), node coords derived from p_partkey;
  tags from ``o_orderkey % 17`` covering the way/area classifiers
  (``osmc/mapper.c:591-631``), zoom tables (``mapper.c:315-418``), the
  ``area=yes`` override and ring-closure routing (``mapper.c:640-659``);
  every third way is closed by repeating its first node.
* **relations** <- ``nation``: member graph with node/way/relation
  members, 3-deep nesting chains and one unreachable 2-cycle
  (fixpoint-closure fixtures, ``osmc/obm.c:333-375``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import synth

# --- node tags: doc_id % 14 -> (key, value) ---------------------------------
NODE_TAG_BRANCHES = [
    ("amenity", "restaurant"),
    ("shop", "bakery"),
    ("tourism", "hotel"),
    ("historic", "castle"),
    ("power", "tower"),
    ("place", "city"),
    ("place", "town"),
    ("place", "hamlet"),
    ("place", "village"),
    ("highway", "traffic_signals"),
    ("crossing", "zebra"),
    ("railway", "crossing"),
    ("highway", "residential"),  # no point class -> dropped
    (None, None),  # untagged -> dropped (mapper.c:576-583)
]

# --- way tags: o_orderkey % 17 -> list[(key, value)] ------------------------
WAY_TAG_BRANCHES = [
    [("highway", "trunk")],
    [("highway", "motorway")],
    [("highway", "trunk_link")],
    [("highway", "primary")],
    [("highway", "motorway_link")],
    [("highway", "secondary")],
    [("highway", "primary_link")],
    [("highway", "service")],
    [("highway", "residential")],
    [("boundary", "administrative")],  # + admin_level added separately
    [("railway", "rail")],
    [("waterway", "river")],
    [("waterway", "riverbank")],  # way-class NULL; cycled -> area Water
    [("power", "line")],
    [("building", "yes")],  # no way class; cycled -> area Building
    [("area", "yes"), ("leisure", "park")],  # forced area
    [],  # untagged -> dropped
]

PART_LON = "((p_partkey * 2654435761 + 999) % 3600000000) - 1800000000"
PART_LAT = "((p_partkey * 2246822519 + 777) % 1700000000) - 850000000"
# concentrate a fraction of part points into the NYC boundary so the
# way<->boundary joins are non-trivially populated
PART_LON_EXPR = (
    f"CAST(CASE WHEN p_partkey % 4 = 0 THEN -741900000 + ((p_partkey * 48271) % 3800000) "
    f"ELSE {PART_LON} END AS BIGINT)"
)
PART_LAT_EXPR = (
    f"CAST(CASE WHEN p_partkey % 4 = 0 THEN 405100000 + ((p_partkey * 69621) % 3800000) "
    f"ELSE {PART_LAT} END AS BIGINT)"
)


def nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes(id, lon_e7, lat_e7, tags MAP<STRING,STRING>)."""
    synth.register_documents(spark, sf_dir)
    key_case = "CASE doc_id % 14 " + " ".join(
        f"WHEN {i} THEN '{k}'" for i, (k, _) in enumerate(NODE_TAG_BRANCHES) if k
    ) + " END"
    val_case = "CASE doc_id % 14 " + " ".join(
        f"WHEN {i} THEN '{v}'" for i, (_, v) in enumerate(NODE_TAG_BRANCHES) if v
    ) + " END"
    return spark.sql(f"""
        SELECT doc_id AS id, {synth.LON_EXPR} AS lon_e7, {synth.LAT_EXPR} AS lat_e7,
               CASE WHEN doc_id % 14 = 13 THEN map()
                    WHEN doc_id % 4 = 0 THEN map({key_case}, {val_case},
                                                'name', concat('n', CAST(doc_id AS STRING)),
                                                'created_by', 'osmgraft')
                    ELSE map({key_case}, {val_case},
                             'name', concat('n', CAST(doc_id AS STRING)))
               END AS tags
        FROM documents
    """)


def part_points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Way-node coordinate dim: one point per part (J6 resolution side)."""
    spark.read.parquet(f"{sf_dir}/part.parquet").createOrReplaceTempView("part")
    return spark.sql(f"""
        SELECT p_partkey AS node_id, {PART_LON_EXPR} AS lon_e7,
               {PART_LAT_EXPR} AS lat_e7
        FROM part
    """)


def way_nodes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """way_nodes(way_id, seq, node_id) — ordered refs (olm.c:201-209).

    ``l_linenumber`` is not unique within an order in the driver
    testdata, so ``seq`` is a deterministic dense rank over
    (l_linenumber, l_partkey) — the ordering contract must be total or
    re-sequencing diverges between engines.
    """
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql("""
        SELECT l_orderkey AS way_id,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey) - 1 AS INT) AS seq,
               l_partkey AS node_id
        FROM lineitem
    """)


def way_nodes_raw_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """way_nodes without the dense ``seq`` rank: (way_id, lnum, node_id).

    ``(lnum, node_id)`` IS the total ordering contract that
    :func:`way_nodes_df` ranks into ``seq`` — consumers that only need
    the *order* (not the rank value itself) can window/sort on the raw
    pair and skip the fixture's 6M-row ROW_NUMBER exchange+sort
    entirely (r6, guide §2.4; same argument as :func:`ways_df`).
    Duplicate (lnum, node_id) pairs within a way are identical rows, so
    any rank tie-break yields the same output multiset."""
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql("""
        SELECT l_orderkey AS way_id, l_linenumber AS lnum,
               l_partkey AS node_id
        FROM lineitem
    """)


def ways_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ways(way_id, tags, nodes ARRAY<LONG>) — every 3rd way ring-closed.

    The ordered ref array sorts ``struct(l_linenumber, l_partkey)``
    directly (r6, guide §2.4): ``seq`` from :func:`way_nodes_df` is a
    dense rank over exactly that pair, so ranking first through a
    6M-row ROW_NUMBER window (a full extra exchange + sort at sf1.0)
    and then sorting by the rank produces the identical array as
    sorting by the pair itself — the window is pure overhead here.
    ``way_nodes_df`` keeps the explicit ``seq`` for consumers whose
    OUTPUT carries it (clip/resequence)."""
    spark.read.parquet(f"{sf_dir}/orders.parquet").createOrReplaceTempView("orders")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView(
        "lineitem"
    )

    entries = []
    for i, tags in enumerate(WAY_TAG_BRANCHES):
        if not tags:
            entries.append(f"WHEN {i} THEN map()")
        else:
            kv = ", ".join(f"'{k}', '{v}'" for k, v in tags)
            if i == 9:  # boundary=administrative + admin_level 0..11
                entries.append(
                    f"WHEN {i} THEN map({kv}, 'admin_level', "
                    "CAST(o_orderkey % 12 AS STRING))"
                )
            else:
                entries.append(f"WHEN {i} THEN map({kv})")
    tag_case = "CASE o_orderkey % 17 " + " ".join(entries) + " END"

    return spark.sql(f"""
        SELECT o.o_orderkey AS way_id, {tag_case} AS tags,
               CASE WHEN o.o_orderkey % 3 = 0
                    THEN concat(n.base, array(n.base[0]))
                    ELSE n.base END AS nodes
        FROM orders o
        JOIN (
          SELECT l_orderkey AS way_id,
                 transform(array_sort(collect_list(
                             struct(l_linenumber, l_partkey))),
                           x -> x.l_partkey) AS base
          FROM lineitem GROUP BY l_orderkey
        ) n ON n.way_id = o.o_orderkey
    """)


def relations_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """relations(relation_id, tags, members ARRAY<STRUCT<ref, type, role>>).

    ids 0..24 (from nation): membership-closure fixtures — each has one
    node member and one way member; every 3rd nests the previous
    relation; 21<->22 form an unreachable cycle.
    ids 100..124: type=multipolygon with outer/''/inner/invalid roles.
    """
    spark.read.parquet(f"{sf_dir}/nation.parquet").createOrReplaceTempView("nation")
    return spark.sql("""
        SELECT CAST(n_nationkey AS BIGINT) AS relation_id,
               map('type', 'group') AS tags,
               filter(array(
                 struct(CAST(n_nationkey * 20 + 3 AS BIGINT) AS ref,
                        'node' AS type, '' AS role),
                 struct(CAST(n_nationkey * 13 + 1 AS BIGINT) AS ref,
                        'way' AS type, '' AS role),
                 CASE WHEN n_nationkey % 3 = 0 AND n_nationkey > 0
                      THEN struct(CAST(n_nationkey - 1 AS BIGINT) AS ref,
                                  'relation' AS type, '' AS role) END,
                 CASE WHEN n_nationkey = 21
                      THEN struct(CAST(22 AS BIGINT) AS ref,
                                  'relation' AS type, '' AS role)
                      WHEN n_nationkey = 22
                      THEN struct(CAST(21 AS BIGINT) AS ref,
                                  'relation' AS type, '' AS role) END
               ), x -> x IS NOT NULL) AS members
        FROM nation
        UNION ALL
        SELECT CAST(n_nationkey + 100 AS BIGINT) AS relation_id,
               map('type', 'multipolygon', 'landuse', 'forest') AS tags,
               filter(array(
                 struct(CAST(n_nationkey * 9 + 3 AS BIGINT) AS ref,
                        'way' AS type, 'outer' AS role),
                 struct(CAST(n_nationkey * 9 + 6 AS BIGINT) AS ref,
                        'way' AS type, '' AS role),
                 struct(CAST(n_nationkey * 9 + 12 AS BIGINT) AS ref,
                        'way' AS type, 'inner' AS role),
                 CASE WHEN n_nationkey % 5 = 0
                      THEN struct(CAST(n_nationkey * 9 + 15 AS BIGINT) AS ref,
                                  'way' AS type, 'bogus' AS role) END,
                 CASE WHEN n_nationkey % 7 = 0
                      THEN struct(CAST(n_nationkey * 20 + 3 AS BIGINT) AS ref,
                                  'node' AS type, 'outer' AS role) END
               ), x -> x IS NOT NULL) AS members
        FROM nation
    """)
