"""north_rule scaling evidence: the same flagship job at two parallelism
levels (local[8] vs local[32] — the sandbox proxy for N vs 4N
executors), reporting throughput at both plus scaling efficiency.

efficiency = throughput_32 / (4 * throughput_8)   (target >= 0.8)

Each level runs in a fresh subprocess (own JVM) so nothing is shared.
The corpus is scaled (replicate) so compute dominates fixed scheduling
overhead — the quantity that actually predicts multi-executor behavior.
Results are appended to BENCH/BASELINE.md by the caller.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICATE = int(os.environ.get("SPARK_GRAFT_SCALING_REPLICATE", "480"))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.abspath("__spark_entry__.py")))
cores = int(sys.argv[1]); sf_dir = sys.argv[2]; replicate = int(sys.argv[3])
from pyspark import StorageLevel
from pyspark.sql import functions as F
from osmgraft.session import get_spark, warm_python_workers
from osmgraft import cells, synth
from osmgraft.extract import extract_entities
from osmgraft.join import spatial_join

spark = get_spark(app=f"scaling-{cores}", cores=cores, shuffle_partitions=cores)
pages = synth.pages_df(spark, sf_dir, replicate=replicate).persist(
    StorageLevel.MEMORY_AND_DISK)
n_pages = pages.count()
warm_python_workers(spark, cores)
t0 = time.time()
ents = extract_entities(pages).persist(StorageLevel.MEMORY_AND_DISK)
joined = spatial_join(spark, ents, synth.boundaries())
tx, ty = cells.mercator_tile_cols(F.col("lon_e7"), F.col("lat_e7"), 12)
out = joined.select("doc_id", "ent_idx", "boundary_id",
                    tx.alias("tile_x"), ty.alias("tile_y"))
n_out = out.count()
dt = time.time() - t0
print(json.dumps({"cores": cores, "n_pages": n_pages, "n_out": n_out,
                  "sec": round(dt, 3),
                  "pages_per_sec": round(n_pages / dt, 1)}))
"""


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), SF_DIR, str(REPLICATE)],
        capture_output=True, text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker[{cores}] failed:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    levels = [int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_LEVELS", "2,8,32").split(",")]
    repeat = int(os.environ.get("SPARK_GRAFT_SCALING_REPEAT", "3"))
    runs = {}
    for _ in range(repeat):  # interleaved repeats, best-of-N (host noise)
        for c in levels:
            r = run_level(c)
            if c not in runs or r["sec"] < runs[c]["sec"]:
                runs[c] = r
    effs = {}
    for lo, hi in zip(levels, levels[1:]):
        factor = hi / lo
        effs[f"{lo}->{hi}"] = round(
            runs[hi]["pages_per_sec"] / (factor * runs[lo]["pages_per_sec"]), 3
        )
    result = {
        "metric": "flagship pipeline scaling efficiency (N vs 4N cores)",
        "levels": runs,
        "scaling_efficiency": effs,
        "target": 0.8,
        "sf_dir": SF_DIR,
        "replicate": REPLICATE,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
