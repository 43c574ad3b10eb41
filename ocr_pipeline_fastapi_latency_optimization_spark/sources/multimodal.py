"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` over Arrow binary batches, deterministic batch shapes.
The actual codec step is STUBBED: the decode registry raises
``NotImplementedError`` for real codecs (image/audio libs are not in this
container) and ships a deterministic ``fake`` codec so the pipeline shape
is exercisable end-to-end. Swapping in Pillow/torchaudio is a one-line
registry change; nothing in the Spark plan moves.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DDL = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat array<double>, decode_status string"
)

N_FEATURES = 8


def _fake_decode_features(payload: bytes) -> list:
    """Deterministic stand-in for decode → resize → feature-extract:
    8 doubles derived from the payload digest (stable across workers)."""
    digest = hashlib.sha256(payload).digest()
    return [int.from_bytes(digest[i * 4 : i * 4 + 4], "big") / 2**32 for i in range(N_FEATURES)]


def _real_decode(payload: bytes) -> list:
    raise NotImplementedError(
        "real image/audio decode requires Pillow/librosa — not available "
        "in this container; register a codec to enable"
    )


CODECS: Dict[str, Callable[[bytes], list]] = {
    "fake": _fake_decode_features,
    "image": _real_decode,
    "audio": _real_decode,
    "video": _real_decode,
}


def extract_features(df: DataFrame, codec: str = "fake") -> DataFrame:
    """mapInPandas over binary batches: per-item digest + feature vector.
    Narrow (no shuffle); Arrow transports the binary column zero-copy-ish;
    failures degrade to a status column, never a task failure (X5 analog)."""
    decode = CODECS[codec]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, status, hashes, sizes = [], [], [], []
            for payload in pdf["payload"]:
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                hashes.append(hashlib.sha256(raw).hexdigest())
                try:
                    feats.append([float(x) for x in decode(raw)])
                    status.append("ok")
                except NotImplementedError:
                    feats.append([0.0] * N_FEATURES)
                    status.append("codec_unavailable")
                except Exception as exc:  # data error → sentinel
                    feats.append([0.0] * N_FEATURES)
                    status.append(f"error:{type(exc).__name__}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "n_bytes": sizes,
                    "sha256": hashes,
                    "feat": feats,
                    "decode_status": status,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(run, schema=FEATURE_DDL)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: the per-item expansion (one row per
    sampled timestamp) is pure DataFrame algebra — sequence + explode; only the
    frame decode itself is a stubbed codec."""
    return (
        df.filter(F.col("kind") == "video")
        .withColumn(
            "sample_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "sample_ts_ms", "mime")
    )


def gen_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (opaque byte payloads)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                kind,
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                640 if kind == "image" else None,
                480 if kind == "image" else None,
                5000 + 250 * i if kind == "video" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
