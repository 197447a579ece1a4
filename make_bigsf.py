"""Deterministic 10x replica of a testdata scale factor, for local
optimization measurement ONLY (guide §1: measure at the scale the
driver measures at — BENCH_r05.json records sf=1.0 / 6M lineitem rows,
but /root/testdata only ships sf<=0.1).

NOT part of any query/bench path: bench.py and the declared queries
read whatever $SPARK_GRAFT_SF_DIR points at; this script merely
materializes a bigger input directory.  No results are cached — the
output is an *input* corpus, shaped like the driver's generator output
(single parquet file per table, ~1Mi-row row groups).

Key remapping is `key' = key * R + r` (replica r of R), matching
synth.pages_df's bench replication, so FK joins scale linearly.
Document texts get a per-replica suffix token so near-dup cluster
structure scales linearly instead of quadratically (10 identical
copies of every doc would explode candidate pair counts in a way the
driver's true sf1.0 corpus does not).

Usage: python make_bigsf.py [SRC_DIR DST_DIR R]
       (default: /root/testdata/sf0.1 /root/sf1.0 10)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/sf1.0"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# per-table int64 key columns remapped as key*R+r.  FK columns are
# remapped consistently with their dimension (r6 review fix: l_partkey
# originally stayed unmapped while part.p_partkey moved, so way-node
# refs resolved against arbitrary replicas — join cardinality was
# unchanged but the resolved coordinates differed from a consistently
# scaled corpus).
KEYS = {
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "region": [],
    "nation": [],
}
# dimension tables NOT replicated (driver sf scaling replicates facts)
NO_REPLICATE = {"region", "nation"}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for name, keys in KEYS.items():
        src = f"{SRC}/{name}.parquet"
        if not os.path.exists(src):
            continue
        t = pq.read_table(src)
        if name in NO_REPLICATE:
            pq.write_table(t, f"{DST}/{name}.parquet",
                           row_group_size=1 << 20)
            print(name, t.num_rows, "(copied)")
            continue
        parts = []
        for r in range(R):
            cols = {}
            for field in t.schema.names:
                col = t[field]
                if field in keys:
                    col = pc.add(pc.multiply(col, pa.scalar(R, col.type)),
                                 pa.scalar(r, col.type))
                elif name == "documents" and field == "text":
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f"zrep{r}"), " ")
                elif name == "documents" and field == "n_chars":
                    # keep n_chars consistent with the suffixed text
                    col = pc.add(col, pa.scalar(len(f" zrep{r}"), col.type))
                elif name == "embeddings" and field == "embedding":
                    # deterministic per-replica jitter on element 0
                    # (r6 review fix: verbatim replication makes the
                    # first-8 IVF centroids EXACT copies of one vector
                    # — maximal bucket degeneracy.  +r/1000 keeps every
                    # near-dup relationship while breaking exact ties.
                    # NOTE: this round's recorded ivf numbers were
                    # measured on the stricter pre-jitter replica.)
                    import numpy as np
                    flat = col.combine_chunks().flatten()
                    vals = flat.to_numpy(zero_copy_only=False).copy()
                    dim = len(vals) // len(t)
                    vals[0::dim] = vals[0::dim] + np.float32(r) * 1e-3
                    col = pa.ListArray.from_arrays(
                        pa.array([i * dim for i in range(len(t) + 1)],
                                 type=pa.int32()),
                        pa.array(vals, type=flat.type),
                    )
                cols[field] = col
            parts.append(pa.table(cols, schema=None))
        big = pa.concat_tables(parts)
        pq.write_table(big, f"{DST}/{name}.parquet", row_group_size=1 << 20)
        print(name, big.num_rows)
    # the driver testdata ships a _DONE sentinel; some tooling globs it
    open(f"{DST}/_DONE", "w").close()


if __name__ == "__main__":
    main()
