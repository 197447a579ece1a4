"""K3: the reference's fixed-record binary OBM store as a distributed
Spark sink + scan.

The reference converts OSM entities into per-country binary files of
FIXED-SIZE records (``osmc/obm.h:27-68``): a repeated header struct
plus a fixed number of inline tag / node-ref / member slots, with
CONTINUATION RECORDS (the header repeated verbatim) whenever an
entity's variable-length lists overflow the inline slots
(``osmc/obm.c:209-226`` nodes, ``:262-282`` ways, ``:318-331``
relations), and tag values chunked into 30-byte slot payloads with the
continuation-key sentinel (``osmc/obm.c:88-117``).

Record layouts — the x86-64 C ABI of the reference structs, all
little-endian (``OsmId`` = uint32 ``MapperTypes.h:36``, ``Coordinate``
= int32 ``MapperTypes.h:17``, ``OsmTimestamp`` = time_t = int64,
``BId`` = long = int64; natural alignment pads the 4-byte fields to
the 8-byte members):

===============  ==========================================  =====
struct           layout                                      bytes
===============  ==========================================  =====
NodeInfo         <u4 id, i4 lat, i4 lon, 4x pad, i8 ts>        24
Way/RelationInfo <u4 id, 4x pad, i8 ts>                        16
BTag             <i4 key, 32s value>                           36
BWayNode         <i8 ref>                                       8
BRelationMember  <i8 ref, i4 type, i4 role>                    16
BNode            NodeInfo + 2 BTag                              96
BWay             WayInfo + 2 BTag + 11 BWayNode                176
BRelation        RelationInfo + 2 BTag + 2 BRelationMember     120
===============  ==========================================  =====

Slot semantics reproduced exactly:

* tag values are split into ``ATTRIBUTE_VALUE_LENGTH - 2 = 30``-byte
  chunks; the first slot carries the dictionary key id, every further
  chunk carries ``ATTRIBUTE_CONTINUATION = 1`` (key ids 0..2 are
  reserved, matching the A5 dictionary); each slot's payload is
  NUL-terminated (values themselves are NUL-free strings);
* unused tag slots are padded with the reference's literal empty-tag
  sentinel (key 0, value ``\\0EMPTY\\0EMPTY\\0EMPTY\\0EMPTY\\0EMPTY!!``,
  ``obm.c:186``); unused way-node slots with ref 0; unused member
  slots with (0, OSM_ENTITY_NONE, 0) — all distinguishable from real
  data because OSM ids are >= 1 and real member types are 3..5;
* an entity occupies 1+ consecutive records; every continuation
  record repeats the entity header verbatim, so the scan re-groups on
  header change (ids are unique per kind per store).

Documented deviations (semantics preserved, bytes made deterministic
and the layout distributed):

* ONE FILE PER SPARK TASK (``part-NNNNN.obm``) instead of one file per
  country — the country split is a partitioning concern and is
  expressed upstream as a DataFrame filter/partition; task-indexed
  names make task retries idempotent (same partition -> same file,
  atomic rename);
* the reference leaves malloc garbage in slot bytes after the NUL
  terminator — unreproducible by design; this sink zero-fills, which
  is required for deterministic output under Spark speculative
  execution / task retry;
* the ``Tree16`` id->offset side index is not written: the store scan
  is a parallel sequential decode (``binaryFile`` source), and point
  lookups are served by the J8 parquet tile store instead.
"""

from __future__ import annotations

import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ATTRIBUTE_VALUE_LENGTH = 32
_CHUNK = ATTRIBUTE_VALUE_LENGTH - 2  # 30 usable bytes per slot
ATTRIBUTE_CONTINUATION = 1
NODE_ATTRIBUTES_COUNT = 2
WAY_ATTRIBUTES_COUNT = 2
RELATION_ATTRIBUTES_COUNT = 2
WAY_NODES_COUNT = 11
RELATION_MEMBERS_COUNT = 2
ENTITY_NODE, ENTITY_WAY, ENTITY_RELATION = 3, 4, 5  # osm.h:21-29

EMPTY_TAG = struct.pack(
    "<i32s", 0, b"\0EMPTY\0EMPTY\0EMPTY\0EMPTY\0EMPTY!!"
)
assert len(EMPTY_TAG) == 36

_NODE_HDR = struct.Struct("<IiixxxxQ")  # 24 (unsigned ts slot: epoch >= 0)
_WAY_HDR = struct.Struct("<IxxxxQ")  # 16
_TAG = struct.Struct("<i30sxx")  # key + 30 payload + NUL + zero pad
_WAYNODE = struct.Struct("<q")
_MEMBER = struct.Struct("<qii")

_NODE_DT = np.dtype(
    [("id", "<u4"), ("lat", "<i4"), ("lon", "<i4"), ("pad", "<i4"),
     ("ts", "<i8"), ("k0", "<i4"), ("v0", "S32"), ("k1", "<i4"), ("v1", "S32")]
)
_WAY_DT = np.dtype(
    [("id", "<u4"), ("pad", "<i4"), ("ts", "<i8"),
     ("k0", "<i4"), ("v0", "S32"), ("k1", "<i4"), ("v1", "S32")]
    + [(f"r{i}", "<i8") for i in range(WAY_NODES_COUNT)]
)
_REL_DT = np.dtype(
    [("id", "<u4"), ("pad", "<i4"), ("ts", "<i8"),
     ("k0", "<i4"), ("v0", "S32"), ("k1", "<i4"), ("v1", "S32"),
     ("m0r", "<i8"), ("m0t", "<i4"), ("m0o", "<i4"),
     ("m1r", "<i8"), ("m1t", "<i4"), ("m1o", "<i4")]
)
assert _NODE_DT.itemsize == 96 and _WAY_DT.itemsize == 176
assert _REL_DT.itemsize == 120


def tag_slots(pairs: list[tuple[int, bytes]]) -> list[bytes]:
    """Chunk (key_id, value_bytes) tags into 36-byte BTag slots:
    30-byte payloads, continuation key on every chunk after the first,
    per-slot NUL terminator (obm.c:88-117)."""
    out = []
    for key, val in pairs:
        chunks = [val[i : i + _CHUNK] for i in range(0, len(val), _CHUNK)] or [b""]
        for ci, chunk in enumerate(chunks):
            k = key if ci == 0 else ATTRIBUTE_CONTINUATION
            out.append(_TAG.pack(k, chunk))
    return out


def _emit(hdr: bytes, slots: list[bytes], n_tag_slots: int,
          extra_lists: list[tuple[list[bytes], int, bytes]]) -> bytes:
    """Assemble the 1+ fixed-size records of one entity: header +
    n_tag_slots tag slots (+ fixed extra slot lists for ways /
    relations), continuation records repeating the header until every
    list is drained (obm.c:209-331 write loops)."""
    recs, ti = [], 0
    positions = [0] * len(extra_lists)
    first = True
    while first or ti < len(slots) or any(
        positions[i] < len(lst) for i, (lst, _, _) in enumerate(extra_lists)
    ):
        first = False
        rec = [hdr]
        for _ in range(n_tag_slots):
            rec.append(slots[ti] if ti < len(slots) else EMPTY_TAG)
            ti += 1 if ti < len(slots) else 0
        for li, (lst, count, empty) in enumerate(extra_lists):
            p = positions[li]
            take = lst[p : p + count]
            rec.extend(take)
            rec.extend([empty] * (count - len(take)))
            positions[li] = p + len(take)
        recs.append(b"".join(rec))
    return b"".join(recs)


def encode_nodes(rows: Iterator[tuple]) -> bytes:
    """rows: (id, lat_e7, lon_e7, ts, [(key_id, value_bytes), ...])."""
    out = []
    for nid, lat, lon, ts, tags in rows:
        hdr = _NODE_HDR.pack(nid, lat, lon, ts)
        out.append(_emit(hdr, tag_slots(tags), NODE_ATTRIBUTES_COUNT, []))
    return b"".join(out)


def encode_ways(rows: Iterator[tuple]) -> bytes:
    """rows: (id, ts, [(key_id, value_bytes)], [node_ref, ...])."""
    out = []
    for wid, ts, tags, refs in rows:
        hdr = _WAY_HDR.pack(wid, ts)
        nodes = [_WAYNODE.pack(r) for r in refs]
        out.append(
            _emit(hdr, tag_slots(tags), WAY_ATTRIBUTES_COUNT,
                  [(nodes, WAY_NODES_COUNT, _WAYNODE.pack(0))])
        )
    return b"".join(out)


def encode_relations(rows: Iterator[tuple]) -> bytes:
    """rows: (id, ts, [(key_id, value_bytes)], [(ref, type, role_id)])."""
    empty = _MEMBER.pack(0, 0, 0)
    out = []
    for rid, ts, tags, members in rows:
        hdr = _WAY_HDR.pack(rid, ts)
        ms = [_MEMBER.pack(r, t, o) for r, t, o in members]
        out.append(
            _emit(hdr, tag_slots(tags), RELATION_ATTRIBUTES_COUNT,
                  [(ms, RELATION_MEMBERS_COUNT, empty)])
        )
    return b"".join(out)


_MANIFEST_SCHEMA = T.StructType([
    T.StructField("file", T.StringType()),
    T.StructField("n_entities", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


def _task_writer(path: str, encode, row_iter):
    """Write one task's records to ``part-<pid>.obm`` via tmp + atomic
    rename (idempotent under task retry: deterministic name, whole-file
    replace — the same commit discipline as the parquet store's
    manifest, store.py T7)."""
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId()
    rows = list(row_iter)
    blob = encode(iter(rows))
    fname = os.path.join(path, f"part-{pid:05d}.obm")
    tmp = fname + f".tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, fname)
    return fname, len(rows), len(blob)


def write_obm(df: DataFrame, path: str, kind: str) -> dict:
    """Distributed OBM sink.  ``df`` canonical columns by kind:

    * ``node``: id, lat_e7, lon_e7, ts, tags ARRAY<STRUCT<key INT,
      value STRING>>
    * ``way``: id, ts, tags, refs ARRAY<BIGINT>
    * ``relation``: id, ts, tags, members ARRAY<STRUCT<ref BIGINT,
      type INT, role INT>>

    Keys/roles are dictionary ids (A5; 0..2 reserved).  Eager: runs the
    job, then commits a ``_MANIFEST`` marker (files are atomically
    renamed per task; the manifest names the expected file set, so a
    torn job is detectable).  Overwrite semantics: pre-existing
    ``part-*.obm`` and the manifest are removed first, so a re-run
    with fewer partitions cannot leave stale records behind.
    Returns {files, n_entities, n_bytes}.

    SHARED-FILESYSTEM / LOCAL-MODE REQUIREMENT (r6, advice item):
    executor tasks write with plain ``open()`` + ``os.replace`` and
    the DRIVER lists/cleans the directory and writes the manifest —
    correct only when driver and executors see one filesystem (local
    mode, or a shared mount such as NFS).  On a multi-node cluster
    with node-local disks the store would scatter silently and the
    manifest/cleanup diverge; route the IO through Hadoop FS APIs (or
    point ``path`` at a shared mount) before running this sink there.
    The same assumption class is documented for bench.py's in-JVM GC.
    """
    os.makedirs(path, exist_ok=True)
    for stale in os.listdir(path):
        if stale.endswith(".obm") or stale == "_MANIFEST":
            os.unlink(os.path.join(path, stale))

    def runner(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows():
            for pdf in batches:
                if kind == "node":
                    for r in pdf.itertuples(index=False):
                        yield (int(r.id), int(r.lat_e7), int(r.lon_e7),
                               int(r.ts),
                               [(int(t["key"]), t["value"].encode("utf-8"))
                                for t in r.tags])
                elif kind == "way":
                    for r in pdf.itertuples(index=False):
                        yield (int(r.id), int(r.ts),
                               [(int(t["key"]), t["value"].encode("utf-8"))
                                for t in r.tags],
                               [int(x) for x in r.refs])
                else:
                    for r in pdf.itertuples(index=False):
                        yield (int(r.id), int(r.ts),
                               [(int(t["key"]), t["value"].encode("utf-8"))
                                for t in r.tags],
                               [(int(m["ref"]), int(m["type"]),
                                 int(m["role"])) for m in r.members])

        encode = {"node": encode_nodes, "way": encode_ways,
                  "relation": encode_relations}[kind]
        fname, n, nb = _task_writer(path, encode, rows())
        yield pd.DataFrame({"file": [fname], "n_entities": [n],
                            "n_bytes": [nb]})

    stats = df.mapInPandas(runner, _MANIFEST_SCHEMA).collect()
    files = sorted(r["file"] for r in stats)
    manifest = os.path.join(path, "_MANIFEST")
    tmp = manifest + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        f.write("\n".join(os.path.basename(x) for x in files) + "\n")
    os.replace(tmp, manifest)
    return {
        "files": files,
        "n_entities": sum(r["n_entities"] for r in stats),
        "n_bytes": sum(r["n_bytes"] for r in stats),
    }


def _slot_frame(ent: np.ndarray, recs: np.ndarray, n_slots: int) -> pd.DataFrame:
    """Long-form (ent, key, payload) tag-slot table from decoded
    records, vectorized; empty pad slots dropped; per-slot payload =
    bytes up to the NUL terminator."""
    keys = np.stack([recs[f"k{i}"] for i in range(n_slots)], axis=1).reshape(-1)
    vals = np.stack([recs[f"v{i}"] for i in range(n_slots)], axis=1).reshape(-1)
    ents = np.repeat(ent, n_slots)
    # numpy S32 strips TRAILING NULs only: a real slot's payload ends at
    # its NUL terminator + zero fill (stripped), while the EMPTY
    # sentinel ends in '!!' and survives as its full 32 bytes
    real = ~((keys == 0) & (vals == EMPTY_TAG[4:]))
    df = pd.DataFrame({"ent": ents[real], "key": keys[real],
                       "val": vals[real]})
    # value reassembly: a continuation slot extends the previous tag
    df["tag"] = (df["key"] != ATTRIBUTE_CONTINUATION).cumsum()
    agg = df.groupby("tag", sort=False).agg(
        ent=("ent", "first"), key=("key", "first"),
        val=("val", lambda s: b"".join(s)),
    )
    return agg


def _decode_blob(content: bytes, dt: np.dtype, hdr_fields: list[str],
                 n_slots: int):
    """(records structured array, entity ordinal per record, slot
    frame).  Entity boundary = any header field change between
    consecutive records (ids unique per kind per store)."""
    if len(content) % dt.itemsize:
        raise ValueError(
            f"corrupt OBM file: {len(content)} bytes is not a multiple "
            f"of the {dt.itemsize}-byte record size"
        )
    recs = np.frombuffer(content, dtype=dt)
    if len(recs) == 0:
        return recs, np.zeros(0, dtype=np.int64), pd.DataFrame(
            columns=["ent", "key", "val"])
    new = np.zeros(len(recs), dtype=bool)
    new[0] = True
    for f in hdr_fields:
        new[1:] |= recs[f][1:] != recs[f][:-1]
    ent = np.cumsum(new) - 1
    return recs, ent, _slot_frame(ent, recs, n_slots)


_TAGS_T = T.ArrayType(T.StructType([
    T.StructField("key", T.IntegerType()),
    T.StructField("value", T.StringType()),
]))


def _tags_by_ent(slots: pd.DataFrame, n_ent: int) -> list[list[dict]]:
    out = [[] for _ in range(n_ent)]
    for e, k, v in zip(slots["ent"], slots["key"], slots["val"]):
        out[int(e)].append({"key": int(k), "value": v.decode("utf-8")})
    return out


NODE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("lat_e7", T.LongType()),
    T.StructField("lon_e7", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("tags", _TAGS_T),
])
WAY_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("tags", _TAGS_T),
    T.StructField("refs", T.ArrayType(T.LongType())),
])
REL_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ts", T.LongType()),
    T.StructField("tags", _TAGS_T),
    T.StructField("members", T.ArrayType(T.StructType([
        T.StructField("ref", T.LongType()),
        T.StructField("type", T.IntegerType()),
        T.StructField("role", T.IntegerType()),
    ]))),
])


def read_obm(spark: SparkSession, path: str, kind: str) -> DataFrame:
    """Parallel OBM scan: one task per file (record groups never span
    files — each file is one sink task's whole entities), numpy
    structured-dtype decode, vectorized slot reassembly."""
    dt, schema, hdrs, n_slots = {
        "node": (_NODE_DT, NODE_SCHEMA, ["id", "lat", "lon", "ts"],
                 NODE_ATTRIBUTES_COUNT),
        "way": (_WAY_DT, WAY_SCHEMA, ["id", "ts"], WAY_ATTRIBUTES_COUNT),
        "relation": (_REL_DT, REL_SCHEMA, ["id", "ts"],
                     RELATION_ATTRIBUTES_COUNT),
    }[kind]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                recs, ent, slots = _decode_blob(bytes(content), dt, hdrs,
                                                n_slots)
                if len(recs) == 0:
                    continue
                first = np.flatnonzero(
                    np.r_[True, ent[1:] != ent[:-1]])
                n_ent = len(first)
                tags = _tags_by_ent(slots, n_ent)
                cols = {"id": recs["id"][first].astype(np.int64),
                        "ts": recs["ts"][first].astype(np.int64)}
                if kind == "node":
                    out = pd.DataFrame({
                        "id": cols["id"],
                        "lat_e7": recs["lat"][first].astype(np.int64),
                        "lon_e7": recs["lon"][first].astype(np.int64),
                        "ts": cols["ts"], "tags": tags,
                    })
                elif kind == "way":
                    # per-record slot matrix -> flat, entity-sorted; one
                    # np.split at entity boundaries (no per-entity scans)
                    refs = np.stack(
                        [recs[f"r{i}"] for i in range(WAY_NODES_COUNT)],
                        axis=1).reshape(-1)
                    bounds = first[1:] * WAY_NODES_COUNT
                    by_ent = [
                        [int(x) for x in grp if x != 0]  # ref-0 padding
                        for grp in np.split(refs, bounds)
                    ]
                    out = pd.DataFrame({
                        "id": cols["id"], "ts": cols["ts"],
                        "tags": tags, "refs": by_ent,
                    })
                else:
                    mr = np.stack([recs["m0r"], recs["m1r"]], axis=1).reshape(-1)
                    mt = np.stack([recs["m0t"], recs["m1t"]], axis=1).reshape(-1)
                    mo = np.stack([recs["m0o"], recs["m1o"]], axis=1).reshape(-1)
                    bounds = first[1:] * RELATION_MEMBERS_COUNT
                    by_ent = [
                        [{"ref": int(a), "type": int(b), "role": int(c)}
                         for a, b, c in zip(r, t, o) if b != 0]  # NONE pad
                        for r, t, o in zip(np.split(mr, bounds),
                                           np.split(mt, bounds),
                                           np.split(mo, bounds))
                    ]
                    out = pd.DataFrame({
                        "id": cols["id"], "ts": cols["ts"],
                        "tags": tags, "members": by_ent,
                    })
                yield out

    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "part-*.obm")
        .load(path)
        .select("content")
    )
    return files.mapInPandas(decode, schema)
