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

from collections.abc import Callable, Iterator

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


def _resolve(decoder, fake_impl, why: str):
    """The decoder seam: a callable passes through untouched, ``'fake'``
    selects the deterministic stand-in, anything else is an explicit
    not-in-this-container error."""
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return fake_impl
    raise NotImplementedError(
        f"decoder={decoder!r}: {why}, not available in this environment — "
        "pass a callable to plug in a real implementation"
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


def extract_binary_features(
    df: DataFrame,
    decoder: str | Callable[[bytes], tuple[int, float]] = "fake",
) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, meta) rows.

    ``decoder`` is the swap-in seam: pass any callable
    ``bytes -> (checksum: int, feat_mean: float)`` — e.g. a PIL/ffmpeg-backed
    extractor on a real deployment — and it runs inside the same
    ``mapInPandas`` batches with NO plan change (tests inject a non-fake
    callable to prove the seam). ``'fake'`` selects the deterministic
    stand-in; any other string raises NotImplementedError (media libs absent
    in this container by design).
    """
    decode = _resolve(decoder, _fake_decode_features, "media decoding requires PIL/ffmpeg")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode(p) for p in pdf["payload"]]
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


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_w", LongType()),
        StructField("out_h", LongType()),
        StructField("n_bytes_out", LongType()),
        StructField("checksum_out", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    decoder: str | Callable[[bytes, int, int], bytes] = "fake",
) -> DataFrame:
    """Arrow-batched image resize over (doc_id, payload, meta) rows.

    ``decoder`` seam: any callable ``(payload, out_w, out_h) -> resized
    bytes`` (PIL's decode+resize+re-encode in production) runs inside the
    same batches with no plan change. ``'fake'``: deterministic stand-in —
    the "resized image" is the payload truncated/zero-padded to
    ``out_w*out_h`` bytes. Emits the resized payload's size + checksum so
    the transform is value-verifiable end-to-end (DuckDB oracle reproduces
    the truncation arithmetic on the same bytes).
    """

    def _fake_resize(p: bytes, w: int, h: int) -> bytes:
        buf = (p or b"")[: w * h]
        return buf + b"\x00" * (w * h - len(buf))

    resize = _resolve(decoder, _fake_resize, "real image resize requires PIL")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = [resize(p, out_w, out_h) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_w": [out_w] * len(pdf),
                    "out_h": [out_h] * len(pdf),
                    "n_bytes_out": [len(b) for b in outs],
                    "checksum_out": [sum(b) % (1 << 31) for b in outs],
                }
            )

    return df.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_bytes", LongType()),
        StructField("frame_checksum", LongType()),
    ]
)


def sample_frames(
    df: DataFrame,
    n_frames: int = 4,
    decoder: str | Callable[[bytes, int], list[bytes]] = "fake",
) -> DataFrame:
    """Arrow-batched frame sampling over (doc_id, payload, meta) rows — one
    output row per sampled frame (the video analog of a decode step).

    ``decoder`` seam: any callable ``(payload, n_frames) -> list of frame
    bytes`` (ffmpeg keyframe extraction in production) runs inside the same
    batches with no plan change. ``'fake'``: the payload is treated as
    ``n_frames`` equal byte slices (frame i = bytes [i*len/n, (i+1)*len/n)).
    Empty payloads yield no frames. The explode (1 input row → n output
    rows) exercises the fan-out shape real frame sampling has.
    """

    def _fake_frames(p: bytes, n: int) -> list[bytes]:
        p = p or b""
        if not p:
            return []
        return [p[i * len(p) // n : (i + 1) * len(p) // n] for i in range(n)]

    extract = _resolve(decoder, _fake_frames, "real frame sampling requires ffmpeg")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(extract(p, n_frames)):
                    rows.append((int(doc_id), i, len(frame), sum(frame) % (1 << 31)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes", "frame_checksum"]
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)
