"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` over Arrow binary batches, deterministic batch shapes.
The codec registry resolves a REAL decoder when its library is
importable (Pillow for images — gated import at module load, the same
pattern as ``functions/arabic.py``) and otherwise degrades to a
``codec_unavailable`` status row, never a task failure. A deterministic
``fake`` codec keeps the pipeline shape exercisable end-to-end in
containers with no media libs; audio/video decoders remain honest stubs
(librosa/av are heavyweight) behind the same registry seam.
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


# gated import resolved once at module load (never per row inside the
# pandas UDF — a failed import is not cached by Python)
try:  # pragma: no cover - optional dep, absent in this container
    from PIL import Image as _PILImage
except ImportError:
    _PILImage = None


def _image_decode_features(payload: bytes) -> list:
    """Real image decode → grayscale → N×N resize → per-row mean
    intensities in [0, 1] (deterministic: fixed resample kernel). Active
    only when Pillow is importable; otherwise the registry keeps the
    honest NotImplementedError stub."""
    if _PILImage is None:
        return _real_decode(payload)
    import io as _io

    img = _PILImage.open(_io.BytesIO(payload)).convert("L")
    img = img.resize((N_FEATURES, N_FEATURES), _PILImage.BILINEAR)
    px = list(img.getdata())  # row-major N×N grayscale bytes
    return [
        sum(px[r * N_FEATURES : (r + 1) * N_FEATURES]) / (255.0 * N_FEATURES)
        for r in range(N_FEATURES)
    ]


CODECS: Dict[str, Callable[[bytes], list]] = {
    "fake": _fake_decode_features,
    "image": _image_decode_features if _PILImage is not None else _real_decode,
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
