"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract run as Arrow-batched ``mapInPandas`` stages.
The codec libraries (PIL/ffmpeg/librosa) are not in this container, so
the decode kernels are STUBBED with a deterministic fake (clearly
marked) — the Spark-side contract (schema, batch shape, partitioning,
UDF signature) is real and tested, which is the part that matters for
the 100 TB plan.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
)


def _fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB decode: deterministic pseudo-feature from the payload hash.

    A real deployment replaces this body with PIL/ffmpeg decode +
    model inference; everything around it (Arrow batching, schema,
    partition sizing) is production-shaped.
    """
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / 2**32).astype(np.float32)


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """mapInPandas feature extraction: one Arrow batch in, one out.

    Batches arrive sized by ``spark.sql.execution.arrow.maxRecordsPerBatch``;
    at scale, repartition upstream so one task holds O(batch) payloads
    in memory, never the whole partition's media in one pandas frame.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def media_feature_summary(media: DataFrame, dim: int = 16) -> DataFrame:
    """Contract-friendly scalar view of :func:`extract_features`:
    ``(media_id, kind, n_bytes, feat_sum)`` where ``feat_sum`` is the
    6-dp-rounded sum of the feature vector — hashable scalars only (the
    driver's canonicalizer cannot sort an ``array<float>`` column), and
    fully reproducible in the DuckDB oracle because the stub decode is
    sha256-of-an-ASCII-payload."""
    from aqueduct_core_spark.functions.text import round6

    feats = extract_features(media, dim)
    feat_sum = F.aggregate(
        F.col("feature"), F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    return feats.select(
        "media_id", "kind", "n_bytes", round6(feat_sum).alias("feat_sum")
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode each video into the frame
    timestamps a decoder would extract — pure column math (sequence +
    explode), no decode.  The decode itself would be a second
    mapInPandas over (media_id, frame_ts) with the payload joined in."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (no external data).

    Payloads are ASCII hex strings (not raw digest bytes) so the DuckDB
    oracle — whose ``sha256`` only accepts VARCHAR — can recompute the
    stub decode byte-for-byte."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = (hashlib.sha256(str(i).encode()).hexdigest() * (1 + i % 4)).encode("ascii")
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "duration_ms": 2500 + 100 * i if kind == "video" else None,
        }
        rows.append((i, kind, payload, meta))
    # few partitions: Arrow batches should be payload-bound, not
    # task-overhead-bound, for a tiny synthetic table
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)
