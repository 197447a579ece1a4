"""Iceberg-style snapshot store: atomic manifest commits, per-partition
lineage counters, watermark checkpoints, and incremental MERGE apply.

Reference semantics reproduced:
  * T6 checkpoint — a persisted watermark advanced ONLY after a
    successful apply (``osmc/osmc.c:514-516``: apply, then
    writeTimestamp); init = MAX(timestamp) over the store
    (``osmc/osmc.c:173-191``).
  * T7 atomicity — per-element transactions become a staging-dir write +
    atomic manifest rename; a crashed job leaves the previous snapshot
    intact and re-runs idempotently.
  * T2/T3 upsert-with-re-cut — a modified entity re-evaluates the
    spatial predicate; entities that left a region are DELETED from it
    (``osmc/olm.c:844-845``).
  * T4 cascade delete — anti-join on deleted ids (``osmc/olm.c:109-139``).
  * T5 latest-version-wins merge of buffered changes
    (``osmc/olm.c:903-965``).

No Iceberg jars exist in this environment; the manifest layer is our
own JSON-over-parquet with rename-commit, which provides the same
resume-from-snapshot contract (north_rule).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _footer_lineage(path: str) -> dict[str, int]:
    """Per-partition row counts for a just-written parquet table, read
    from the Parquet FOOTERS only (pyarrow metadata) — no second Spark
    scan of data that was in memory a moment ago.  One part file = one
    write task = one lineage partition; the key is the task index from
    the ``part-NNNNN-`` file name.

    Assumptions (manifest lineage format v2): the table root is a
    LOCAL-filesystem path (``os.listdir``; an object-store root would
    need the Hadoop FS API instead) and part files follow the default
    Spark committer naming.  v2 keys are WRITER task indexes — v1
    (pre-footer) keys were read-back ``spark_partition_id`` values;
    the two agree for a fresh single-job write but are not defined to
    be interchangeable.  Nothing consumes the keys today; consumers
    must treat them as opaque lineage labels."""
    import pyarrow.parquet as pq

    lineage: dict[str, int] = {}
    for f in sorted(os.listdir(path)):
        if not (f.startswith("part-") and f.endswith(".parquet")):
            continue
        part = str(int(f.split("-")[1]))
        lineage[part] = (
            lineage.get(part, 0)
            + pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        )
    return lineage


class SnapshotStore:
    """A versioned parquet table with atomic JSON-manifest commits.

    Layout::

        root/
          data/<table>/v<N>/part-*.parquet
          _manifests/v<N>.json   (tables, row counts, per-partition
                                  lineage, watermark, parent version)
          _manifests/CURRENT     (atomic pointer, rename-committed)
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest plumbing --------------------------------------------------

    def current_version(self) -> int | None:
        cur = os.path.join(self.root, "_manifests", "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def manifest(self, version: int | None = None) -> dict | None:
        version = self.current_version() if version is None else version
        if version is None:
            return None
        path = os.path.join(self.root, "_manifests", f"v{version}.json")
        with open(path) as f:
            return json.load(f)

    def _commit_manifest(self, m: dict) -> None:
        v = m["version"]
        mdir = os.path.join(self.root, "_manifests")
        tmp = os.path.join(mdir, f".v{v}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=2, sort_keys=True)
        os.rename(tmp, os.path.join(mdir, f"v{v}.json"))
        ptmp = os.path.join(mdir, ".CURRENT.tmp")
        with open(ptmp, "w") as f:
            f.write(str(v))
        os.rename(ptmp, os.path.join(mdir, "CURRENT"))  # the atomic commit

    # -- write / read -------------------------------------------------------

    def commit(
        self,
        tables: dict[str, DataFrame],
        watermark: str | None = None,
        note: str = "",
    ) -> int:
        """Write every table as a new snapshot version and atomically
        publish the manifest.  Records per-partition row counts (the
        north_rule's lineage + counters)."""
        prev = self.current_version()
        version = 0 if prev is None else prev + 1
        # snapshot semantics: tables not rewritten in this commit carry
        # forward from the parent manifest (Iceberg-style)
        parent_manifest = self.manifest(prev) if prev is not None else None
        entry_tables = dict(parent_manifest["tables"]) if parent_manifest else {}
        for name, df in tables.items():
            path = os.path.join(self.root, "data", name, f"v{version}")
            df.write.mode("overwrite").parquet(path)
            lineage = _footer_lineage(path)
            entry_tables[name] = {
                "path": path,
                "row_count": sum(lineage.values()),
                "partition_counts": lineage,
            }
        self._commit_manifest(
            {
                "version": version,
                "parent": prev,
                "tables": entry_tables,
                "watermark": watermark,
                "note": note,
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
        )
        return version

    def read(self, table: str, version: int | None = None) -> DataFrame:
        m = self.manifest(version)
        if m is None or table not in m["tables"]:
            raise KeyError(f"table {table} not in snapshot")
        return self.spark.read.parquet(m["tables"][table]["path"])

    def watermark(self) -> str | None:
        m = self.manifest()
        return None if m is None else m.get("watermark")


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    order_cols: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """T5 latest-version-wins MERGE: base rows + change rows collapse to
    the newest version per key; op='delete' removes the key.

    changes must carry (key, op in create|modify|delete, *order_cols,
    *payload_cols).  Deterministic: order_cols must be a total order.
    """
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    tagged = changes.select(
        key, "op", *order_cols, *payload_cols
    ).unionByName(
        base.select(
            key,
            F.lit("base").alias("op"),
            *[F.lit(None).cast("long").alias(c) for c in order_cols],
            *payload_cols,
        )
    )
    latest = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col("op") != "delete").drop("op", *order_cols)


def apply_geo_changes(
    spark: SparkSession,
    store: SnapshotStore,
    changes: DataFrame,
    polys,
    watermark: str,
) -> int:
    """Incremental re-cut (T2/T3): apply point changes to the
    ``points`` table, recompute the spatial join ONLY for changed keys,
    and rewrite ``matches`` with leave-region deletes; commit one new
    snapshot (checkpoint advances only on success)."""
    from .join import spatial_join

    base_pts = store.read("points")
    base_matches = store.read("matches")

    new_pts = merge_changes(
        base_pts,
        changes,
        key="pid",
        order_cols=["batch_id"],
        payload_cols=["lon_e7", "lat_e7"],
    )
    changed_keys = changes.select("pid").distinct()
    # re-cut only the changed keys (anti-join removes stale matches,
    # including entities that moved out of a region or were deleted)
    kept_matches = base_matches.join(changed_keys, "pid", "left_anti")
    recut = spatial_join(
        spark, new_pts.join(changed_keys, "pid", "left_semi"), polys
    ).select("pid", "boundary_id")
    new_matches = kept_matches.unionByName(recut)

    return store.commit(
        {"points": new_pts, "matches": new_matches},
        watermark=watermark,
        note="incremental apply",
    )
