"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partition-friendly batch
shapes, Arrow-batched mapInPandas UDF signatures. The codec step itself (PIL /
ffmpeg / torchaudio) is STUBBED behind ``DecoderNotAvailable`` with a
deterministic fake, because media libraries are not in this container; swapping
the fake for a real decoder changes one function body, none of the plumbing.

Pattern per SURVEY.md §2.7: heavy per-record Python work rides mapInPandas
(Arrow batches, never per-row Python), mirroring how the reference hands user
lambdas a whole stage (Transformer.java:31-61) — but batched.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real-decode path; this container has no media libraries."""


def decode_real(payload: bytes, kind: str):  # pragma: no cover - stub by design
    raise DecoderNotAvailable(
        f"real {kind} decoding requires PIL/ffmpeg/torchaudio; install and replace "
        "decode_real — all Spark-side plumbing is agnostic to the decoder body"
    )


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from the payload digest — stands in for the
    decoder+model so batching/partitioning/schema are testable end-to-end."""
    d = hashlib.sha256(payload).digest()
    return [int.from_bytes(d[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, dim: int = 8, use_real_decoder: bool = False) -> DataFrame:
    """Decode/feature-extract over Arrow batches via mapInPandas.

    Per-batch pandas vectorization; output rows align 1:1 with input (a frame
    sampler returning N rows per video is the same shape with a list-explode)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            if use_real_decoder:
                feats = [decode_real(p, k) for p, k in zip(payloads, pdf["kind"])]
            else:
                feats = [
                    _fake_features(bytes(p), dim) if p is not None else None for p in payloads
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else None for p in payloads],
                    "digest": [
                        hashlib.md5(bytes(p)).hexdigest() if p is not None else None
                        for p in payloads
                    ],
                    "features": feats,
                }
            )

    return df.mapInPandas(_batches, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: 1→N fan-out per media row. The decoder stub
    emits deterministic fake frame digests; a real ffmpeg body keeps the exact
    same output schema (media_id, frame_no, frame_digest)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame_digest", T.StringType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_no": [], "frame_digest": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = max(1, len(payload) // every_n)
                for f in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(f)
                    rows["frame_digest"].append(
                        hashlib.md5(bytes(payload) + f.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(_batches, out_schema)


def binary_meta(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Binary-column plumbing that IS exercisable here: encode text → binary,
    measure bytes, digest — pure JVM columns (octet_length/md5 on binary),
    SQL-mirrorable for the oracle gate."""
    bin_col = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.octet_length(bin_col).alias("n_bytes"),
        F.md5(bin_col).alias("digest"),
    )
