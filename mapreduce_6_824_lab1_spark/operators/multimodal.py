"""Multimodal column plumbing (extension surface, SURVEY.md §2.C).

Design: image/audio/video payloads are opaque ``binary`` columns with typed
metadata alongside. The fixtures carry no binary media, so the payload here
is the UTF-8 encoding of ``documents.text`` — which makes the WHOLE Spark
path real and oracle-checkable (schema, Arrow batching, ``mapInPandas``
signature, partitioning), while the codec step that would need image/audio
libraries is stubbed behind ``NotImplementedError`` as mandated.

The feature-extraction query is the one place in the engine where Python
touches rows — deliberately, as the mapInPandas reference pattern: Arrow
batch in, vectorized pandas ops, Arrow batch out. At 100 TB this is the
correct shape for codec work (CPU-bound per-record transforms with no
shuffle), NOT for relational logic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_6_824_lab1_spark.catalog import load_table
from mapreduce_6_824_lab1_spark.registry import query

FEATURE_SCHEMA = "doc_id long, n_bytes long, head_hex string"


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Vectorized per-batch feature extraction over binary payloads."""
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.map(len).astype("int64"),
                "head_hex": payload.map(lambda b: bytes(b)[:8].hex().upper()),
            }
        )


@query(
    "multimodal_features",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       upper(hex(encode(substr(text, 1, 8)))) AS head_hex
FROM documents
""",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binary payload → mapInPandas feature extraction (size + header bytes).

    The oracle recomputes the same features relationally (text is ASCII, so
    ``substr`` over chars == slice over bytes) — proving the Arrow round-trip
    through Python is byte-faithful.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# Codec stubs — the container has no image/audio libraries (environment
# constraint); these define the contract the real decoders would fill.
# ---------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, channels int, mean_luma double"
)


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB — real impl would decode image bytes (PIL/OpenCV) per Arrow batch.

    Contract: input batches with (doc_id long, payload binary); output
    IMAGE_FEATURE_SCHEMA. Wire with ``df.mapInPandas(decode_image_batch,
    schema=IMAGE_FEATURE_SCHEMA)`` once a codec library is available.
    """
    raise NotImplementedError(
        "image decoding requires an image library not present in this "
        "environment; Spark-side plumbing is provided by multimodal_features"
    )


def sample_video_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB — real impl would frame-sample video payloads (1 row per frame)."""
    raise NotImplementedError(
        "video frame sampling requires a media library not present in this "
        "environment"
    )


# ---------------------------------------------------------------------------
# Frame sampling with a DETERMINISTIC FAKE decoder: the payload is treated
# as fixed-size byte "frames" and every STRIDE-th frame is emitted. The
# decode step is fake by documented environment constraint (no media libs),
# but everything Spark-side is the real production shape: binary column in,
# 1-row-in/N-rows-out Arrow-batched mapInPandas, typed per-frame schema out
# — swapping the chunker for an actual codec changes no plumbing.
# ---------------------------------------------------------------------------

FRAME_BYTES = 16
FRAME_STRIDE = 4

FRAME_SCHEMA = "doc_id long, frame_idx long, frame_bytes long, byte_sum long"


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Emit every FRAME_STRIDE-th FRAME_BYTES-sized chunk of each payload."""
    for pdf in batches:
        doc_ids: list[int] = []
        idxs: list[int] = []
        sizes: list[int] = []
        sums: list[int] = []
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
            for idx in range(0, n_frames, FRAME_STRIDE):
                chunk = b[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES]
                doc_ids.append(did)
                idxs.append(idx)
                sizes.append(len(chunk))
                sums.append(sum(chunk))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "frame_bytes": pd.Series(sizes, dtype="int64"),
                "byte_sum": pd.Series(sums, dtype="int64"),
            }
        )


@query(
    "multimodal_frame_sample",
    oracle=f"""
SELECT doc_id,
       CAST(idx AS BIGINT) AS frame_idx,
       CAST(len(frame) AS BIGINT) AS frame_bytes,
       CAST(list_aggregate(
           list_transform(range(1, len(frame) + 1),
                          i -> ord(substring(frame, i, 1))),
           'sum') AS BIGINT) AS byte_sum
FROM (
    SELECT doc_id, idx,
           substring(text, idx * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
    FROM documents,
         unnest(range(0, CAST(ceil(octet_length(encode(text))
                                   * 1.0 / {FRAME_BYTES}) AS BIGINT))) AS t(idx)
    WHERE idx % {FRAME_STRIDE} = 0
)
""",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling over binary payloads (deterministic fake codec).

    The oracle rebuilds the same frames relationally (ASCII text: char
    slices == byte slices, ``ord`` == byte value), proving the exploded
    row-per-frame output of the Python path is byte-faithful. 100 TB: frame
    sampling is embarrassingly parallel and shuffle-free — cost scales with
    bytes scanned; emitted rows are the sampled fraction (1/STRIDE) of the
    input volume, so downstream stages see bounded expansion.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_sample_frames, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio-shaped feature extraction: windowed RMS energy. The payload's bytes
# play the role of PCM samples (real audio would go through a codec stub
# above); windows are WIN_SAMPLES wide, non-overlapping. Spark side is the
# production shape — numpy reshape + one vectorized pass per Arrow batch,
# 1 row in / windows-per-payload rows out; the oracle recomputes the same
# energies relationally from the ASCII codes (ord == byte value).
# ---------------------------------------------------------------------------

WIN_SAMPLES = 32

AUDIO_SCHEMA = "doc_id long, window_idx long, rms double"


def _audio_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import numpy as np

    for pdf in batches:
        ids, widx, rms = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                np.float64
            )
            n = len(arr) // WIN_SAMPLES
            if n == 0:
                continue
            m = arr[: n * WIN_SAMPLES].reshape(n, WIN_SAMPLES)
            r = np.sqrt((m * m).mean(axis=1))
            ids.extend([doc_id] * n)
            widx.extend(range(n))
            rms.extend(np.floor(r * 10000 + 0.5) / 10000)
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "window_idx": pd.Series(widx, dtype="int64"),
                "rms": pd.Series(rms, dtype="float64"),
            }
        )


@query(
    "multimodal_audio_energy",
    oracle=f"""
WITH wins AS (
    SELECT doc_id, text,
           unnest(range(0, CAST(floor(octet_length(encode(text))
               / {WIN_SAMPLES}) AS BIGINT))) AS window_idx
    FROM documents
)
SELECT doc_id, window_idx,
       floor((sqrt(list_sum(list_transform(
           range(1 + window_idx * {WIN_SAMPLES},
                 1 + window_idx * {WIN_SAMPLES} + {WIN_SAMPLES}),
           i -> ord(substr(text, CAST(i AS INT), 1))
                * ord(substr(text, CAST(i AS INT), 1)))) / {WIN_SAMPLES}.0))
           * 10000 + 0.5) / 10000 AS rms
FROM wins
""",
)
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over binary payloads via mapInPandas."""
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_audio_energy, schema=AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Resize (downsample) with the same deterministic fake decoder: payload
# bytes as a W=16-column image, 2x2 integer average pooling. Swapping the
# byte-grid "decoder" for PIL changes no Spark-side plumbing (environment
# constraint documented at decode_image_batch).
# ---------------------------------------------------------------------------

IMG_W = 16
POOL = 2

RESIZE_SCHEMA = (
    "doc_id long, out_w long, out_h long, n_cells long, checksum long"
)


def _resize_pool(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """2x2 average-pool each payload's byte grid (floor arithmetic)."""
    import numpy as np  # noqa: PLC0415

    for pdf in batches:
        doc_ids, out_h, n_cells, checksum = [], [], [], []
        for did, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload)
            h = len(b) // IMG_W
            h2 = h - (h % POOL)
            if h2 < POOL:
                continue
            a = np.frombuffer(b[: h2 * IMG_W], dtype=np.uint8).reshape(
                h2, IMG_W
            ).astype(np.int64)
            pooled = (
                a[0::2, 0::2] + a[1::2, 0::2] + a[0::2, 1::2] + a[1::2, 1::2]
            ) // 4
            doc_ids.append(did)
            out_h.append(pooled.shape[0])
            n_cells.append(pooled.size)
            checksum.append(int(pooled.sum()))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "out_w": pd.Series(
                    [IMG_W // POOL] * len(doc_ids), dtype="int64"
                ),
                "out_h": pd.Series(out_h, dtype="int64"),
                "n_cells": pd.Series(n_cells, dtype="int64"),
                "checksum": pd.Series(checksum, dtype="int64"),
            }
        )


RESIZE_ORACLE = f"""
WITH dims AS (
    SELECT doc_id, text,
           (len(text) // {IMG_W}) - ((len(text) // {IMG_W}) % {POOL}) AS h2
    FROM documents
),
rows_i AS (
    SELECT doc_id, text, h2,
           unnest(generate_series(0, h2 // {POOL} - 1)) AS i
    FROM dims WHERE h2 >= {POOL}
),
cells AS (
    SELECT doc_id, h2, i, unnest(generate_series(0, {IMG_W // POOL - 1})) AS j
    FROM rows_i
),
vals AS (
    SELECT c.doc_id, c.h2,
           (ascii(substr(d.text, CAST(2*c.i*{IMG_W} + 2*c.j + 1 AS INT), 1))
          + ascii(substr(d.text, CAST(2*c.i*{IMG_W} + 2*c.j + 2 AS INT), 1))
          + ascii(substr(d.text, CAST((2*c.i+1)*{IMG_W} + 2*c.j + 1 AS INT), 1))
          + ascii(substr(d.text, CAST((2*c.i+1)*{IMG_W} + 2*c.j + 2 AS INT), 1))
           ) // 4 AS pv
    FROM cells c JOIN dims d USING (doc_id)
)
SELECT doc_id,
       CAST({IMG_W // POOL} AS BIGINT) AS out_w,
       CAST(max(h2) // {POOL} AS BIGINT) AS out_h,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(pv) AS BIGINT) AS checksum
FROM vals GROUP BY doc_id
"""


@query("multimodal_resize", oracle=RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE (downsample) over binary payloads: each payload is
    'decoded' to a 16-column byte grid and 2×2 integer average-pooled —
    numpy-vectorized inside Arrow-batched ``mapInPandas``, the production
    shape for thumbnailing/downsampling media at scale (map-only: one
    payload in, one metadata+checksum row out; no shuffle anywhere).

    The decoder is the documented deterministic fake (no media libs in
    this container — decode_image_batch states the real contract); the
    pooling arithmetic is REAL and floor-integer, and the oracle
    recomputes every pooled cell relationally from the ASCII bytes, so
    the Arrow transfer and the numpy pooling are verified value-exact,
    not just shape-plausible. Rows shorter than one pooled row are
    excluded on both engines.
    """
    docs = load_table(spark, sf_dir, "documents")
    payloads = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payloads.mapInPandas(_resize_pool, schema=RESIZE_SCHEMA)
