"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The decode kernels themselves are STUBBED (this container has no
image/audio libraries — see ``DecoderUnavailable`` / the deterministic fake)
but the Spark-side machinery is real and tested:

* schema: ``(asset_id long, modality string, payload binary,
  meta struct<width int, height int, sample_rate int, n_frames int>)``
* partition-aware batch processing via ``mapInPandas`` — Arrow batches of
  binary payloads, bounded batch size (``spark.sql.execution.arrow.
  maxRecordsPerBatch``) so a partition of large blobs never materializes
  at once,
* feature extraction / resize / frame-sample UDF signatures with typed
  output schemas, ready to swap a real decoder in.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType(), True),
                    StructField("height", IntegerType(), True),
                    StructField("sample_rate", IntegerType(), True),
                    StructField("n_frames", IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


class DecoderUnavailable(NotImplementedError):
    """Raised by the real-decoder path: no image/audio libs in this env."""


def real_decode(payload: bytes, modality: str):
    """STUB — swap in PIL/librosa/av here on a cluster image that has them."""
    raise DecoderUnavailable(
        f"no decoder for modality={modality!r} in this environment; "
        "use deterministic_features (fake) or install codecs on the cluster image"
    )


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets for pipeline testing."""
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 8  # 256 B
        meta = (64, 64, None, None) if modality == "image" else (
            (None, None, 16000, None) if modality == "audio" else (64, 64, None, 30)
        )
        rows.append((i, modality, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def extract_features(assets: DataFrame, dim: int = 16, use_real_decoder: bool = False) -> DataFrame:
    """Batch feature extraction over binary payloads (mapInPandas / Arrow).

    With ``use_real_decoder=False`` features are a deterministic fake
    drawn from the portable 60-bit md5 hash family (6-decimal values in
    [0, 1)), so the full distributed path — schema, batching, shuffle —
    is exercised without codecs AND the output is reproducible in DuckDB
    for the correctness gate. The real path raises DecoderUnavailable
    where the decode call belongs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                if use_real_decoder:
                    real_decode(bytes(payload), modality)  # raises
                # fake features from the ENGINE-PORTABLE 60-bit md5 family
                # (same family as simhash / the corpus generator): component
                # j = (int(md5(payload_hex ':' j)[:15], 16) % 1e6) / 1e6.
                # DuckDB re-derives the identical values in SQL
                # (oracles.multimodal_features_sql), so the full
                # mapInPandas/Arrow path is value-hash-checkable — unlike
                # the r2 PCG64 draws, which had no SQL twin.
                hexp = bytes(payload).hex()
                feats.append(
                    np.array(
                        [
                            (
                                int(
                                    hashlib.md5(
                                        f"{hexp}:{j}".encode()
                                    ).hexdigest()[:15],
                                    16,
                                )
                                % 1_000_000
                            )
                            / 1e6
                            for j in range(dim)
                        ],
                        dtype=np.float32,
                    )
                )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "feature": [list(f) for f in feats]}
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: (asset_id, frame_index) rows derived
    from metadata only — the decode of each sampled frame is the stubbed
    kernel. Shows the explode-before-decode pattern that keeps per-task
    memory bounded for long videos."""
    return (
        assets.where(F.col("modality") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(every_n)
                )
            ).alias("frame_index"),
        )
    )
