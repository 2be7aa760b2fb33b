"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed through Arrow-batched mapInPandas.

The container has no image/audio codecs, so the *decode* step is stubbed
(clearly marked below); everything Spark-side — schema, binary columns,
Pandas-UDF batch iteration, partitioning — is real and tested. Swap
``_decode_stub`` for a PIL/ffmpeg call on a real cluster and nothing else
changes.

At 100 TB: binary payloads ride the columnar scan (parquet binary columns
or spark.read.format("binaryFile")); mapInPandas streams Arrow batches so
one task never holds more than a batch of blobs; metadata-only queries
never touch the binary column at all (column pruning).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hadoop_distexec_spark.registry import register
from hadoop_distexec_spark.sources.tables import table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, width int, height int, n_frames int"
)


def decode_image(content: bytes) -> "object":
    """STUB: real image decode requires PIL/opencv (not in this container).

    The Spark-side contract (binary in, typed metadata out) is exercised via
    ``_decode_stub``; replace this body with e.g. ``PIL.Image.open`` on a
    real cluster."""
    raise NotImplementedError("image decode requires PIL/opencv; see _decode_stub")


def decode_audio(content: bytes) -> "object":
    """STUB: real audio decode requires soundfile/ffmpeg (not in container)."""
    raise NotImplementedError("audio decode requires soundfile/ffmpeg; see _decode_stub")


def _decode_stub(blob: bytes) -> tuple[int, int, int, int]:
    """Deterministic fake decode: metadata derived arithmetically from the
    payload bytes, so the pipeline is testable (and oracle-checkable)
    without codecs."""
    n = len(blob)
    return n, n % 640, (n * 7) % 480, n % 30


def extract_media_meta(
    df: DataFrame, decode: Callable[[bytes], tuple[int, int, int, int]] | None = None
) -> DataFrame:
    """mapInPandas metadata extraction over a binary `content` column.

    Input needs columns (doc_id: long, media_type: string, content: binary).
    Arrow-batched: each pandas batch is decoded vectorized-ish and yielded;
    blobs never accumulate beyond one batch per task.

    ``decode`` injects the real codec — ``blob -> (byte_len, width, height,
    n_frames)``, e.g. a PIL/ffprobe wrapper on a cluster that has them —
    with no other code changes; it must be picklable (module-level
    function), since it ships inside the mapInPandas closure. Default is
    the deterministic arithmetic stub (no codecs in this container).
    """
    decode = decode or _decode_stub

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["content"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": meta.map(lambda m: m[0]).astype("int64"),
                    "width": meta.map(lambda m: m[1]).astype("int32"),
                    "height": meta.map(lambda m: m[2]).astype("int32"),
                    "n_frames": meta.map(lambda m: m[3]).astype("int32"),
                }
            )

    return df.mapInPandas(decode_batches, MEDIA_SCHEMA)


FRAME_BYTES = 256  # fake-codec frame size
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len int"


def _chunk_frames(blob: bytes) -> "Iterator[tuple[int, bytes]]":
    """STUB frame iterator: every FRAME_BYTES-byte slice is "a frame".
    A real implementation yields (frame_idx, frame_bytes) from ffmpeg."""
    for idx in range(len(blob) // FRAME_BYTES):
        yield idx, blob[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]


def sample_frames(
    df: DataFrame,
    every_n: int = 4,
    frames: Callable[[bytes], "Iterator[tuple[int, bytes]]"] | None = None,
) -> DataFrame:
    """Frame-sampling plumbing for video-ish blobs: emit every ``every_n``-th
    frame. ``frames`` injects the real demuxer (``blob -> iterator of
    (frame_idx, frame_bytes)``, picklable); the default chunking stub
    treats each FRAME_BYTES-byte slice as a frame. The mapInPandas fan-out
    (1 row in, many rows out, Arrow-batched) is the part that matters at
    scale: sampling happens *inside* the executor pass, so unsampled
    frames are never materialized into the DataFrame.

    Input columns: (doc_id: long, content: binary).
    """
    frames = frames or _chunk_frames

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": []}
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                for idx, chunk in frames(blob):
                    if idx % every_n:
                        continue
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_len"].append(len(chunk))
            yield pd.DataFrame(out).astype(
                {"doc_id": "int64", "frame_idx": "int32", "frame_len": "int32"}
            )

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)




def _content_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents as a (doc_id, content: binary) frame, spread to full
    parallelism BEFORE the Arrow stage: the fixture is one small parquet
    file (one input partition), and a mapInPandas decode/resize/encode
    over it would otherwise run as a single task — with real codecs
    injected, the difference between one core and the cluster."""
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.encode("text", "UTF-8").alias("content"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


@register(
    "q_multimodal_frames",
    oracle=f"""
    SELECT doc_id,
           CAST(UNNEST(range(0, octet_length(encode(text)) // {FRAME_BYTES}, 4)) AS INT)
             AS frame_idx,
           CAST({FRAME_BYTES} AS INT) AS frame_len
    FROM documents
    WHERE octet_length(encode(text)) // {FRAME_BYTES} > 0
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling end-to-end on real data: text bytes as the fake
    video payload, every 4th 256-byte frame emitted via the mapInPandas
    fan-out; the oracle mirrors the chunk arithmetic."""
    docs = _content_df(spark, sf_dir)
    return sample_frames(docs, every_n=4)


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST(octet_length(encode(text)) % 640 AS INT) AS width,
           CAST((octet_length(encode(text)) * 7) % 480 AS INT) AS height,
           CAST(octet_length(encode(text)) % 30 AS INT) AS n_frames
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal pipeline end-to-end on real data: documents.text cast
    to a binary content column, metadata extracted through the Arrow
    mapInPandas path. The stub decode is arithmetic on byte length, which
    is exactly what the oracle mirrors — so this *does* hash-check the
    whole Pandas-UDF plumbing."""
    docs = _content_df(spark, sf_dir).withColumn(
        "media_type", F.lit("text/plain")
    )
    return extract_media_meta(docs)


RESIZE_SCHEMA = "doc_id long, content binary, width int, height int"


def resize_image(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: binary in -> binary out with new dimensions.

    ``resize`` injects the real codec (``(blob, width, height) -> bytes``,
    picklable — e.g. a PIL Image.open/resize/save wrapper). STUB default
    (no codecs in this container): the "resized" payload is the blob
    truncated/cycled to exactly width*height bytes — a deterministic,
    size-correct fake. The Spark-side contract is the real part:
    binary->binary through Arrow batches, output rows 1:1 with input,
    constant output size per row (the property a downstream training
    loader relies on).

    Input columns: (doc_id: long, content: binary).
    """
    target = width * height

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _resize(blob: bytes) -> bytes:
                if resize is not None:
                    out = resize(blob, width, height)
                    # enforce the constant-stride contract for injected
                    # codecs too (same spirit as extract_features' encoder
                    # shape check): raw pixel payloads are width*height x
                    # a whole number of channels; a compressed/variable-
                    # length encoding would silently break downstream
                    # fixed-stride loaders
                    if len(out) == 0 or len(out) % target != 0:
                        raise ValueError(
                            f"injected resize returned {len(out)} bytes — "
                            f"not a positive multiple of width*height="
                            f"{target}; expected a raw pixel payload, not "
                            "a compressed encoding"
                        )
                    return out
                if not blob:
                    return bytes(target)
                reps = -(-target // len(blob))  # ceil
                return (blob * reps)[:target]

            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content": pdf["content"].map(_resize),
                    "width": width,
                    "height": height,
                }
            ).astype({"width": "int32", "height": "int32"})

    return df.mapInPandas(resize_batches, RESIZE_SCHEMA)


FEATURE_DIM = 16
FEATURE_SCHEMA = "doc_id long, feature array<float>"


def extract_features(
    df: DataFrame,
    dim: int = FEATURE_DIM,
    encoder: Callable[[bytes], "object"] | None = None,
) -> DataFrame:
    """Feature-extraction plumbing: binary in -> float vector out (the
    embed-the-image step of a multimodal pipeline).

    STUB compute: byte-histogram features (dim buckets over byte values,
    L1-normalized) — deterministic, numpy-vectorized inside the Arrow
    batch, and shaped exactly like a real encoder output
    (``array<float>`` column ready for the similarity operators in
    llmops). ``encoder`` injects the real model (``blob -> sequence of
    dim floats``, picklable — e.g. an ONNX/torch wrapper); the fixed-dim
    output contract is enforced for injected encoders too.
    """
    import numpy as np

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf["content"]:
                if encoder is not None:
                    vec = np.asarray(encoder(blob), dtype=np.float32)
                    if vec.shape != (dim,):
                        raise ValueError(
                            f"encoder returned shape {vec.shape}, expected ({dim},)"
                        )
                    feats.append(vec)
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                if arr.size == 0:
                    feats.append(np.zeros(dim, dtype=np.float32))
                    continue
                # bucket = byte * dim // 256 maps 0..255 onto exactly
                # 0..dim-1 for any dim (the former 256//dim divisor
                # overflowed the fixed-dim contract when dim ∤ 256 —
                # ADVICE r01 #2); int cast first: uint8 * dim would wrap
                buckets = arr.astype(np.int64) * dim // 256
                hist = np.bincount(buckets, minlength=dim).astype(np.float32)
                feats.append(hist / hist.sum())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].astype("int64"), "feature": feats})

    return df.mapInPandas(feat_batches, FEATURE_SCHEMA)


_RES_W, _RES_H = 64, 64
_RES_LEN = _RES_W * _RES_H


@register(
    "q_multimodal_resize",
    # BYTE-based oracle (ADVICE r04 #2): DuckDB has no BLOB substring, so
    # the payload is addressed through its hex image — one hex PAIR per
    # byte — and cycled-byte i of the resized payload is the pair at
    # source byte ((i-1) % n) + 1. Character-based substr(text, ...)
    # would silently diverge from the Spark side's UTF-8 bytes on any
    # non-ASCII document.
    oracle=f"""
    WITH b AS (
      SELECT doc_id, hex(encode(text)) AS h,
             octet_length(encode(text)) AS n
      FROM documents
      WHERE octet_length(encode(text)) > 0),
    cyc AS (
      SELECT doc_id,
        (SELECT string_agg(substr(h, CAST(2 * ((i - 1) % n) + 1 AS INT), 2),
                           '' ORDER BY i)
         FROM range(1, 17) t(i)) AS head16,
        (SELECT string_agg(substr(h, CAST(2 * ((i - 1) % n) + 1 AS INT), 2),
                           '' ORDER BY i)
         FROM range({_RES_LEN - 15}, {_RES_LEN + 1}) t(i)) AS tail16
      FROM b)
    SELECT doc_id,
           CAST({_RES_LEN} AS BIGINT) AS out_len,
           CAST({_RES_W} AS INT) AS width, CAST({_RES_H} AS INT) AS height,
           head16, tail16
    FROM cyc
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing end-to-end on real data: text bytes as the fake
    image payload cycled to a constant 64x64 stride through the Arrow
    mapInPandas path. The oracle recomputes the cycling arithmetic
    byte-for-byte at both ends of the payload (head16 = bytes 1..16,
    tail16 = bytes 4081..4096, both under modular cycling over the UTF-8
    byte stream), so a broken stride, off-by-one cycle, padding bug, or
    chars-vs-bytes confusion hash-fails. Empty payloads are out of the
    report's contract on both sides (cyclic indexing is undefined at
    n=0; the stub zero-fills them, but SQL can't express that case —
    filter mirrored in the oracle's WHERE)."""
    docs = _content_df(spark, sf_dir).where(F.octet_length("content") > 0)
    resized = resize_image(docs, width=_RES_W, height=_RES_H)
    return resized.select(
        "doc_id",
        F.length("content").cast("long").alias("out_len"),
        "width",
        "height",
        F.hex(F.expr("substring(content, 1, 16)")).alias("head16"),
        F.hex(F.expr(f"substring(content, {_RES_LEN - 15}, 16)")).alias("tail16"),
    )


@register(
    "q_multimodal_features",
    # BYTE-based oracle (ADVICE r04 #2): histogram over the UTF-8 BYTES
    # via the hex image — string_split(text,'') would histogram CODE
    # POINTS and drift from the Spark side on any non-ASCII document.
    oracle=f"""
    WITH chars AS (
      SELECT doc_id,
             CAST('0x' || substr(h, CAST(2 * k - 1 AS INT), 2) AS INT)
               * {FEATURE_DIM} // 256 AS bucket
      FROM (SELECT doc_id, hex(encode(text)) AS h,
                   UNNEST(range(1, octet_length(encode(text)) + 1)) AS k
            FROM documents)),
    hist AS (
      SELECT doc_id, bucket, COUNT(*) AS cnt FROM chars GROUP BY doc_id, bucket),
    best AS (
      SELECT doc_id, bucket, cnt,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, bucket) AS rnk
      FROM hist)
    SELECT b.doc_id,
           CAST(b.bucket AS INT) AS top_bucket,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes
    FROM best b JOIN documents d USING (doc_id) WHERE rnk = 1
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction plumbing end-to-end: byte-histogram features
    (the stub encoder, dim=FEATURE_DIM) computed through the Arrow
    mapInPandas path, reduced to the argmax bucket per document. The
    reduction is chosen for cross-engine exactness: distinct integer
    counts stay distinct after the float32 L1 normalization (gaps are
    >=1/n_bytes, orders of magnitude above float32 eps at corpus doc
    sizes), so argmax-with-lowest-bucket-tiebreak is identical to the
    oracle's integer argmax — numpy argmax takes the first maximum, the
    SQL rank breaks ties on bucket asc. A padding bug, bucket-mapping
    drift, or normalization error changes the winner and hash-fails.
    Empty payloads are excluded on both sides (the stub zero-vector has
    no meaningful argmax; the oracle's histogram naturally drops them —
    filter mirrored explicitly)."""
    docs = _content_df(spark, sf_dir).where(F.octet_length("content") > 0)
    feats = extract_features(docs)
    j = feats.join(
        table(spark, sf_dir, "documents").select(
            "doc_id", F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("n_bytes")
        ),
        "doc_id",
    )
    return j.select(
        "doc_id",
        (F.expr("array_position(feature, array_max(feature))") - 1)
        .cast("int")
        .alias("top_bucket"),
        "n_bytes",
    )
