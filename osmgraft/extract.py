"""Geo-entity extraction from page text — the parse stage of the pipeline.

Analog of the reference's streaming XML element extraction
(``osmc/osm.c:123-174``, ``osmc/osm.c:351-398``): one input page yields
0..N typed geo entities.  Implemented as ``mapInPandas`` (UDTF-shaped,
Arrow-batched; input_hint forbids per-row Python) with **byte-identical
text slices** — the extracted ``mention`` bytes are exact substrings of
the page text, never re-encoded (the lossless lesson of the reference's
strict UTF pipeline, ``osmc/utf.c:95-165``).

Mention grammar: ``@place{name|lat_e7|lon_e7}`` with integer e7
coordinates (reference fixed-point contract, ``osmc/MapperTypes.h:28``).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MENTION_RE = re.compile(
    rb"@place\{([^{}|]*)\|(-?\d+)\|(-?\d+)\}"
)

ENTITY_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("doc_id", T.LongType()),
    T.StructField("ent_idx", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("lat_e7", T.LongType()),
    T.StructField("lon_e7", T.LongType()),
    T.StructField("mention", T.BinaryType()),  # byte-identical slice
])


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        urls, dids, idxs, names, lats, lons, mentions = [], [], [], [], [], [], []
        doc_ids = pdf["doc_id"] if "doc_id" in pdf.columns else [-1] * len(pdf)
        for url, doc_id, text in zip(pdf["url"], doc_ids, pdf["text"]):
            raw = text.encode("utf-8")  # slice in byte space, decode names only
            for i, m in enumerate(MENTION_RE.finditer(raw)):
                urls.append(url)
                dids.append(doc_id)
                idxs.append(i)
                names.append(m.group(1).decode("utf-8"))
                lats.append(int(m.group(2)))
                lons.append(int(m.group(3)))
                mentions.append(m.group(0))
        yield pd.DataFrame(
            {
                "url": pd.Series(urls, dtype="object"),
                "doc_id": pd.Series(dids, dtype="int64"),
                "ent_idx": pd.Series(idxs, dtype="int32"),
                "name": pd.Series(names, dtype="object"),
                "lat_e7": pd.Series(lats, dtype="int64"),
                "lon_e7": pd.Series(lons, dtype="int64"),
                "mention": pd.Series(mentions, dtype="object"),
            }
        )


def extract_entities(pages: DataFrame) -> DataFrame:
    """pages(url, doc_id, text, ...) -> geo entity rows (0..N per page)."""
    cols = [c for c in ("url", "doc_id", "text") if c in pages.columns]
    return pages.select(*cols).mapInPandas(_extract_batches, ENTITY_SCHEMA)


_MENTION_SQL_RE = r"@place\{([^{}|]*)\|(-?\d+)\|(-?\d+)\}"


def extract_entities_jvm(pages: DataFrame) -> DataFrame:
    """JVM fast path for the well-formed mention grammar: the whole
    extraction stays inside whole-stage codegen (``regexp_extract_all``
    + ``arrays_zip`` + ``posexplode``) — no Python, no Arrow exchange.

    Byte-identity holds because the mention is a regex match over the
    text: casting the matched substring to binary reproduces its exact
    UTF-8 bytes.  Use the mapInPandas path (``extract_entities``) for
    irregular real-world HTML where a streaming parser is needed; the
    two paths are equality-tested.
    """
    from pyspark.sql import functions as F

    zipped = F.arrays_zip(
        F.regexp_extract_all("text", F.lit(_MENTION_SQL_RE), F.lit(1)).alias("name"),
        F.regexp_extract_all("text", F.lit(_MENTION_SQL_RE), F.lit(2)).alias("lat"),
        F.regexp_extract_all("text", F.lit(_MENTION_SQL_RE), F.lit(3)).alias("lon"),
        F.regexp_extract_all("text", F.lit(_MENTION_SQL_RE), F.lit(0)).alias("m"),
    )
    cols = [c for c in ("url", "doc_id") if c in pages.columns]
    out = pages.select(
        *cols, F.posexplode(zipped).alias("ent_idx", "e")
    )
    if "doc_id" not in out.columns:
        out = out.withColumn("doc_id", F.lit(-1).cast("long"))
    return out.select(
        *(["url"] if "url" in out.columns else []),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("ent_idx").cast("int").alias("ent_idx"),
        F.col("e.name").alias("name"),
        F.col("e.lat").cast("long").alias("lat_e7"),
        F.col("e.lon").cast("long").alias("lon_e7"),
        F.col("e.m").cast("binary").alias("mention"),
    )
