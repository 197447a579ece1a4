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

# In-JVM pure-CPU probe: 50M codegen loop iterations per core, one
# task wave — outside load shows up as straggler-inflated wall time.
# Interleaved immediately before every timed sample, so each recorded
# query time carries its own host-noise evidence at the DRIVER'S OWN
# CADENCE (r3 verdict item 1: three queries regressed only in the
# driver run while controls improved; per-sample probes make the
# noise-vs-regression call mechanical — see BENCH/BASELINE.md,
# "Reading the driver bench").  Quiet-window reference on this host
# at 32 cores: ~0.19-0.21 s (PROBE_QUIET_SEC below; measured across a
# full quiet bench run — an earlier 0.5 s estimate was itself taken
# while a test suite ran concurrently, a live demo of why probes must
# be interleaved with the thing they calibrate).
PROBE_ROWS_PER_CPU = 50_000_000
PROBE_QUIET_SEC = 0.2


def cpu_probe(spark):
    """One timed probe run; returns wall seconds."""
    t0 = time.time()
    spark.range(0, PROBE_ROWS_PER_CPU * CPUS, 1, CPUS).selectExpr(
        "sum(id * 3 + 1)"
    ).collect()
    return round(time.time() - t0, 3)
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
    # settle the heap before any clock starts: cache construction just
    # churned several GB through the young gen, and letting G1's mixed
    # collections run during the first timed samples steals GC-thread
    # cores from them (both r4 quiet runs show an elevated first ~2
    # minutes).  A long-lived executor does not carry cache-build
    # garbage into steady state, so collect it up front.
    # LOCAL-MODE ASSUMPTION: System.gc() via the gateway collects the
    # DRIVER JVM, which only reaches the executor heap because this
    # bench runs local-mode (driver == executor).  On a real cluster
    # this line is a no-op for executors — trigger executor GC via a
    # mapPartitions task there instead.
    spark.sparkContext._jvm.System.gc()

    def run():
        # per-stage split (r4 verdict item 4: localize the driver-vs-
        # quiet flagship residual IN the record): stage "extract" ends
        # at the ents-cache materialization, stage "join_tile" is the
        # cover join + refine + tile cut.  The stage boundary is a real
        # action either way (the cache materialization predates the
        # instrumentation), so the split adds no work to the pipeline.
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
        t_extract = time.time() - t0
        joined = spatial_join(spark, ents, synth.boundaries())
        tx, ty = cells.mercator_tile_cols(F.col("lon_e7"), F.col("lat_e7"), 12)
        out = joined.select(
            "doc_id", "ent_idx", "boundary_id",
            tx.alias("tile_x"), ty.alias("tile_y"),
        )
        n_out = out.count()
        dt = time.time() - t0
        ents.unpersist()
        return dt, n_out, {
            "extract": round(t_extract, 3),
            "join_tile": round(dt - t_extract, 3),
        }

    return n_pages, run


def main():
    from osmgraft.queries import QUERIES
    from osmgraft.session import get_spark

    spark = get_spark(app="osmgraft-bench", cores=CPUS, shuffle_partitions=CPUS)

    n_pages, run_flagship = make_flagship_runner(spark)
    cpu_probe(spark)  # untimed probe JIT warm-up
    _, _, warm_stages = run_flagship()  # untimed JIT/codegen warm-up
    # (steady-state metric; a long-lived executor amortizes first-use
    # compilation to zero — see bench_scaling.py for the rationale).
    # The warm-up pass's stage split IS recorded (flagship_stages[0]):
    # a first-pass-only stage inflation (cold page cache, first-use
    # Arrow path) shows as warm-up >> later samples in that column.
    flagship_probes = [cpu_probe(spark)]
    t1, n_out, s1 = run_flagship()
    flagship_stages = [warm_stages, s1]

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
    bench_queries = [n for n in bench_queries if n in QUERIES]

    def run_query(name):
        t0 = time.time()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite").save()
        return round(time.time() - t0, 3)

    # Sweep structure (not per-query best-of-N bursts): one untimed
    # warm-up sweep over all queries, then 2 timed sweeps, each sample
    # preceded by a cpu probe.  Consecutive samples of one query sat
    # ~1 s apart under the old shape, so a single load burst poisoned
    # every sample of that query while leaving its neighbors fast
    # (exactly the r3 pricing_summary/geo_pip_join signature);
    # sweep-spreading decorrelates the two samples by the full sweep
    # length (~15 s) and the probes timestamp the load around each.
    # chronological (label, sec) log of every probe — within a sweep,
    # query i's pre-probe doubles as query i-1's post-probe, and the
    # sweep-end probe closes the bracket, so every sample is flanked
    # by probes on both sides in the record
    probe_log = [("pre_flagship_1", flagship_probes[0])]
    samples = {n: [] for n in bench_queries}
    probes = {n: [] for n in bench_queries}
    for name in bench_queries:
        run_query(name)  # codegen/JIT warm-up, untimed
    for sweep in range(2):
        for name in bench_queries:
            p = cpu_probe(spark)
            probe_log.append((f"pre_{name}_{sweep + 1}", p))
            probes[name].append(p)
            samples[name].append(run_query(name))
        p = cpu_probe(spark)
        probe_log.append((f"sweep_{sweep + 1}_end", p))
    per_query = {n: min(s) for n, s in samples.items()}

    # two more flagship samples AFTER the query loop — temporally
    # decorrelated from t1, so best-of-3 survives a single load burst
    flagship_probes.append(cpu_probe(spark))
    probe_log.append(("pre_flagship_2", flagship_probes[-1]))
    t2, _, s2 = run_flagship()
    flagship_probes.append(cpu_probe(spark))
    probe_log.append(("pre_flagship_3", flagship_probes[-1]))
    t3, _, s3 = run_flagship()
    flagship_probes.append(cpu_probe(spark))
    probe_log.append(("post_flagship_3", flagship_probes[-1]))
    flagship_stages += [s2, s3]
    flagship_samples = [round(t, 3) for t in (t1, t2, t3)]
    flagship_sec = min(flagship_samples)

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
        # host-noise evidence at driver cadence: every timed sample's
        # immediately-preceding cpu-probe wall time.  Quiet reference
        # ~PROBE_QUIET_SEC; a probe at 2-3x quiet alongside a slow
        # query sample = host noise, not a plan regression (protocol:
        # BENCH/BASELINE.md "Reading the driver bench").
        "probe_quiet_sec": PROBE_QUIET_SEC,
        "probes": probes,
        "query_samples": {n: samples[n] for n in samples},
        "flagship_samples": flagship_samples,
        # per-sample stage split, INCLUDING the untimed warm-up pass as
        # element 0 (samples t1..t3 are elements 1..3): localizes any
        # driver-vs-quiet residual to extract vs join_tile, and a
        # warm-up-only inflation names the cause (cold page cache /
        # first-JVM-use) in the record itself.
        "flagship_stages": flagship_stages,
        "flagship_probes": flagship_probes,
        "probe_log": probe_log,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
