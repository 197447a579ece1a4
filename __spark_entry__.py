"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (page text -> geo-entity
extraction -> cell encode -> cell-prefiltered ray-cast PIP spatial join
-> z12 tile assignment) on sf0.001.  ``queries()`` / ``oracle_sql()``
expose every implemented operator from SURVEY.md §2 for the DuckDB
correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Which pages mention a place inside each boundary, and which z12
    tile does each mention land in.
    """
    from osmgraft import cells, synth
    from osmgraft.extract import extract_entities
    from osmgraft.join import spatial_join

    sf_dir = "/root/testdata/sf0.001"
    pages = synth.pages_df(spark, sf_dir)
    # persist + eager materialize: spatial_join fans the entity set
    # into two plan branches (cell-cover join + match-everything
    # polygons); a cold cache lets both branches race and re-run the
    # extraction, so populate it before the join plan executes
    ents = extract_entities(pages).persist()
    ents.count()
    joined = spatial_join(spark, ents, synth.boundaries())
    tx, ty = cells.mercator_tile_cols(F.col("lon_e7"), F.col("lat_e7"), 12)
    return joined.select(
        "url",
        "doc_id",
        "ent_idx",
        "name",
        "boundary_id",
        F.lit(12).cast("int").alias("z"),
        tx.alias("tile_x"),
        ty.alias("tile_y"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osmgraft.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from osmgraft.queries import ORACLES

    return dict(ORACLES)
