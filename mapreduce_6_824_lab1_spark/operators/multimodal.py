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
