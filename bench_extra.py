"""Extra measurement harness for optimization work (guide §1.4): times
individual declared queries (noop sink) and named sub-stages outside the
frozen ``bench.py``.  Usage:

    SPARK_GRAFT_SF_DIR=... python bench_extra.py q1 q2 ...      # queries
    SPARK_GRAFT_SF_DIR=... python bench_extra.py minhash_stages # stage split

Each target runs REPS timed passes after one untimed warm-up; prints one
JSON line per target.  This file is NOT part of the driver contract —
bench.py stays the frozen measurement surface.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "3"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.time()
    fn()
    return round(time.time() - t0, 3)


def minhash_stages(spark):
    """Per-stage split of dedup_minhash_lsh (r5 verdict item 1):
    stage "signatures" = shingle derivation + df cap + packed signature
    groupBy, materialized to the cache (the eager count inside
    minhash_lsh_pairs); stage "band_verify" = band explode + candidate
    equi-join + the two verify joins + the eager localCheckpoint.
    Measured here by timing the packed-signature subtree alone (noop)
    and the full query, reporting (signatures, total - signatures)."""
    from osmgraft import dedup
    from osmgraft.queries import QUERIES, _MAX_DF, _read_spread

    d = _read_spread(spark, SF_DIR.rstrip("/"), "documents")
    sh = dedup.shingles(d, 3, max_df=_MAX_DF)
    # shared builder (r6): timing the SAME subtree the query runs, not
    # a copy that could drift from the library shape
    packed = dedup.packed_signatures(sh, k=8)
    out = {"signatures": [], "total": []}
    for r in range(REPS + 1):
        t_sig = timed(lambda: noop(packed))
        t_tot = timed(lambda: noop(QUERIES["dedup_minhash_lsh"](spark, SF_DIR)))
        if r > 0:  # first pass is warm-up
            out["signatures"].append(t_sig)
            out["total"].append(t_tot)
    out["band_verify_derived"] = [
        round(t - s, 3) for s, t in zip(out["signatures"], out["total"])
    ]
    return out


def main():
    from osmgraft.queries import QUERIES
    from osmgraft.session import get_spark, warm_python_workers

    spark = get_spark(app="osmgraft-bench-extra", cores=CPUS,
                      shuffle_partitions=CPUS)
    warm_python_workers(spark)

    for target in sys.argv[1:]:
        spark.sparkContext.setJobDescription(f"bench_extra:{target}")
        if target == "minhash_stages":
            res = minhash_stages(spark)
        else:
            q = QUERIES[target]
            samples = []
            for r in range(REPS + 1):
                t = timed(lambda: noop(q(spark, SF_DIR)))
                if r > 0:
                    samples.append(t)
            res = {"samples": samples, "best": min(samples)}
        print(json.dumps({"target": target, "sf_dir": SF_DIR, **res}),
              flush=True)


if __name__ == "__main__":
    main()
