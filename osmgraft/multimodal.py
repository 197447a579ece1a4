"""Multimodal column plumbing: opaque binary payloads with typed
metadata, Arrow-batched feature extraction, and real header decoding.

Image/audio/video payloads are opaque ``binary`` columns.  The
Spark-side plumbing — schema, partition-friendly batch shape,
``mapInPandas`` signatures — is real and tested.  Two decode tiers:

* **header parse** (real): PNG / JPEG / GIF container headers are
  parsed from the raw bytes with pure stdlib code
  (:func:`parse_image_header`) — dimensions + format, no codec
  library needed.  Synthetic payloads are *valid* containers
  (:func:`synth_image_payload`: real zlib IDAT for PNG, real marker
  stream for JPEG), so the parser is exercised against genuinely
  well-formed bytes and cross-checked by a closed-form oracle.
* **pixel decode** (stubbed): full raster decode needs PIL/ffmpeg,
  which this container lacks; ``decode_payload`` raises unless
  ``fake=True`` (deterministic digest feature of the same batch
  shape a real decoder would produce).
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Wrap document text bytes as opaque media payloads (deterministic
    stand-in for crawled image/audio bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Real image containers: deterministic synthesis + pure-stdlib header parse
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# every SOFn marker that carries frame dimensions (C4/C8/CC are
# DHT/JPG/DAC, not frames)
_JPEG_SOF = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def synth_dims(doc_id: int) -> tuple[str, int, int]:
    """Closed-form (fmt, width, height) for a doc's synthetic image —
    the same arithmetic the DuckDB oracle runs, so parsing the generated
    bytes back is an end-to-end cross-check of generator AND parser."""
    fmt = ("png", "jpeg", "gif")[(doc_id // 3) % 3]
    return fmt, 1 + doc_id % 64, 1 + (doc_id * 7) % 48


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def synth_image_payload(doc_id: int) -> bytes:
    """A *valid* minimal image container with :func:`synth_dims`
    dimensions.  PNG: real IHDR/IDAT/IEND with correct CRCs and a
    zlib-compressed all-zero raster.  JPEG: SOI + APP0(JFIF) + SOF0
    marker stream (header-complete; no entropy-coded scan — the pixel
    codec is the declared stub).  GIF: GIF89a logical screen."""
    fmt, w, h = synth_dims(doc_id)
    if fmt == "png":
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
        raw = (b"\x00" + b"\x00\x00\x00" * w) * h  # filter byte + RGB per row
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, 6))
            + _png_chunk(b"IEND", b"")
        )
    if fmt == "jpeg":
        app0 = b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
        sof0 = struct.pack(">BHH", 8, h, w) + bytes(
            [3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
        )
        return (
            b"\xff\xd8"  # SOI
            + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
            + b"\xff\xc0" + struct.pack(">H", len(sof0) + 2) + sof0
            + b"\xff\xd9"  # EOI
        )
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(fmt, width, height) from raw container bytes — pure stdlib, no
    codec.  Handles PNG (IHDR), JPEG (marker walk to any SOFn, skipping
    variable-length segments), GIF (logical screen descriptor).
    ``None`` for anything unrecognized/truncated — never raises."""
    b = payload
    if len(b) >= 24 and b[:8] == _PNG_SIG and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h
    if len(b) >= 4 and b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
                i += 2  # standalone markers carry no length
                continue
            if marker == 0xD9:  # EOI before any SOF
                return None
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if marker in _JPEG_SOF:
                if i + 4 + 5 > len(b):
                    return None
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h
            i += 2 + seglen
        return None
    if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h
    return None


IMAGE_DIM_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])


def image_dimensions(media: DataFrame) -> DataFrame:
    """Arrow-batched header parse over opaque payloads: (media_id, fmt,
    width, height); unparseable payloads yield fmt='unknown', -1 dims
    (kept, not dropped — at crawl scale silent drops hide corruption)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "fmt": [p[0] if p else "unknown" for p in parsed],
                    "width": pd.Series(
                        [p[1] if p else -1 for p in parsed], dtype="int32"
                    ),
                    "height": pd.Series(
                        [p[2] if p else -1 for p in parsed], dtype="int32"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, IMAGE_DIM_SCHEMA)


def media_images_from_documents(docs: DataFrame) -> DataFrame:
    """The image slice of the media table with *real* container bytes
    (deterministic stand-in for crawled images: doc_id % 3 == 0, same
    population as ``media_from_documents``'s 'image' kind)."""
    imgs = docs.filter(F.col("doc_id") % 3 == 0)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "kind": "image",
                    "payload": [
                        synth_image_payload(int(d)) for d in pdf["doc_id"]
                    ],
                }
            )

    return imgs.select("doc_id").mapInPandas(
        run,
        T.StructType([
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )


def decode_payload(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """STUB: real decoders (PIL/ffmpeg/torchaudio) are not available in
    this environment.  ``fake=True`` yields a deterministic 8-dim
    feature from the payload digest — same batch shape as a real
    decoder, so the distributed plumbing is fully exercised."""
    if not fake:
        raise NotImplementedError(
            f"no {kind} codec in this environment; pass fake=True for the "
            "deterministic digest feature"
        )
    h = hashlib.sha256(payload).digest()
    return np.frombuffer(h[:32], dtype=np.uint8).reshape(8, 4).sum(axis=1).astype(
        np.float32
    ) / 255.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads
    (mapInPandas — one batch per Arrow chunk, no per-row Python
    overhead beyond the codec call itself)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_payload(bytes(p), k, fake=fake).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
