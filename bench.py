"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].  Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline metric: pages/sec through the flagship pipeline (page text ->
entity extraction -> cell-prefiltered PIP spatial join -> z12 tile
assignment) on a deterministically replicated corpus (~600k pages at
sf0.1).  Scaling evidence for the north_rule (local[8] vs local[32])
lives in bench_scaling.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("SPARK_GRAFT_REPLICATE", "120"))
# Pipeline variant tag: extraction engine x output projection.  r1/r2
# historical numbers: r1 = arrow-full, r2 = arrow-pruned; r3+ default =
# jvm-pruned (whole-stage-codegen extraction, url/mention never built).
# Numbers are comparable only within the same variant tag.
PIPELINE_VARIANT = "jvm-pruned"


def make_flagship_runner(spark):
    """Prepare the flagship pipeline and return (n_pages, run) where
    ``run()`` executes one timed pass.  Passes are taken at different
    points of the whole bench run (before AND after the per-query
    loop) so a single noisy-neighbor burst cannot poison every sample
    of the best-of-N."""
    from pyspark.sql import functions as F

    from osmgraft import cells, synth
    from osmgraft.extract import extract_entities
    from osmgraft.join import spatial_join
    from osmgraft.session import warm_python_workers

    from pyspark import StorageLevel

    pages = synth.pages_df(spark, SF_DIR, replicate=REPLICATE).cache()
    n_pages = pages.count()  # materialize input before the clock starts
    warm_python_workers(spark)  # worker-pool spawn is a cluster one-time cost

    def run():
        t0 = time.time()
        # projection pushed through the extraction boundary: the tile
        # cut reads neither url nor mention, so they are never built
        ents = extract_entities(
            pages, columns=("doc_id", "ent_idx", "lat_e7", "lon_e7"),
            engine="jvm",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        # force materialization BEFORE the join: the join plan has two
        # branches over ents (cover join + empty-polygon cross join);
        # if the cache is still cold both branches race and can each
        # recompute the extraction (measured: bimodal 1.7s vs 9s runs)
        ents.count()
        joined = spatial_join(spark, ents, synth.boundaries())
        tx, ty = cells.mercator_tile_cols(F.col("lon_e7"), F.col("lat_e7"), 12)
        out = joined.select(
            "doc_id", "ent_idx", "boundary_id",
            tx.alias("tile_x"), ty.alias("tile_y"),
        )
        n_out = out.count()
        dt = time.time() - t0
        ents.unpersist()
        return dt, n_out

    return n_pages, run


def main():
    from osmgraft.queries import QUERIES
    from osmgraft.session import get_spark

    spark = get_spark(app="osmgraft-bench", cores=CPUS, shuffle_partitions=CPUS)

    n_pages, run_flagship = make_flagship_runner(spark)
    run_flagship()  # untimed JIT/codegen warm-up (steady-state metric;
    # a long-lived executor amortizes first-use compilation to zero —
    # see bench_scaling.py for the rationale)
    t1, n_out = run_flagship()

    bench_queries = [
        "geo_pip_join",
        "geo_tile_assign",
        "geo_knn",
        "pricing_summary",
        "segment_revenue",
        "dedup_exact",
        "doc_token_stats",
        "ann_topk",
        "tile_rollup",
        "corpus_clean",
        "dedup_minhash_lsh",
    ]
    per_query = {}
    for name in bench_queries:
        if name not in QUERIES:
            continue
        best = None
        for i in range(3):  # pass 0 = untimed codegen/JIT warm-up,
            # then best-of-2 (noisy host)
            t0 = time.time()
            QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            dt = time.time() - t0
            if i > 0:
                best = dt if best is None or dt < best else best
        per_query[name] = round(best, 3)

    # two more flagship samples AFTER the query loop — temporally
    # decorrelated from t1, so best-of-3 survives a single load burst
    t2, _ = run_flagship()
    t3, _ = run_flagship()
    flagship_sec = min(t1, t2, t3)

    result = {
        "metric": "flagship extract+spatial-join+tile pipeline "
        f"[{PIPELINE_VARIANT}], wall sec "
        f"({n_pages} pages -> {n_out} match rows; "
        f"{round(n_pages / flagship_sec)} pages/sec)",
        "value": round(flagship_sec, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "pages_per_sec": round(n_pages / flagship_sec, 1),
        "pipeline": PIPELINE_VARIANT,
        "n_pages": n_pages,
        "cpus": CPUS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
