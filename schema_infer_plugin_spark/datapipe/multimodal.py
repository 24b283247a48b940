"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video content is carried as a ``binary`` column with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas`` so
each task processes columnar batches, never Python rows. The actual media
decoders (PIL/ffmpeg/torchaudio) are NOT in this container, so the decode step
is a clearly-marked deterministic fake behind ``decoder="fake"`` — the Spark
plumbing (schema, batch iteration, partition behavior) is real and tested;
swapping in a real decoder changes one function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("feat_mean", DoubleType()),
    ]
)


def with_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Attach a synthetic binary payload + metadata struct (stand-in for real
    media ingested from object storage). Payload = UTF-8 bytes of the text —
    deterministic and size-realistic for plumbing tests."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).cast("long").alias("n_bytes"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
        ).alias("meta"),
    )


def _fake_decode_features(payload: bytes) -> tuple[int, float]:
    """Deterministic stand-in for a media decoder: byte checksum + mean byte.

    A real deployment replaces this with e.g. PIL image stats or audio frame
    energies; the surrounding Arrow batching is unchanged.
    """
    if not payload:
        return 0, 0.0
    s = sum(payload)
    return s % (1 << 31), s / len(payload)


def extract_binary_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta) rows.

    ``decoder='fake'`` uses the deterministic stand-in; any other value raises
    NotImplementedError (media libs absent in this container by design).
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real media decoding requires PIL/ffmpeg, "
            "not available in this environment — plumbing is decoder-agnostic"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "checksum": [f[0] for f in feats],
                    "feat_mean": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)
