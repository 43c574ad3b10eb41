"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side plumbing is real and tested — schema, partition-preserving
``mapInPandas`` over Arrow binary batches, deterministic batch shapes.
The codec registry resolves a REAL decoder when its library is
importable (Pillow for images — gated import at module load, the same
pattern as ``functions/arabic.py``) and otherwise degrades to a
``codec_unavailable`` status row, never a task failure. A deterministic
``fake`` codec keeps the pipeline shape exercisable end-to-end in
containers with no media libs. The AUDIO codec is real for WAV/PCM via
stdlib ``wave`` (segment-RMS features) and the VIDEO codec is real for
uncompressed YUV4MPEG2 (per-segment mean luma) — both zero-dependency.
Stream-compression ENVELOPES (gzip/bz2/xz around any payload) are
decoded for real via the stdlib with a decompression-bomb guard;
codec-compressed formats (MP3/H.264) degrade to per-row error
sentinels, and a real deployment swaps in librosa/av decoders behind
the same registry seam.
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


def _audio_decode_features(payload: bytes) -> list:
    """Real audio decode for WAV/PCM via stdlib ``wave`` (no optional
    dep): parse frames, split into N_FEATURES contiguous segments, emit
    per-segment RMS amplitude normalized to [0, 1]. Deterministic pure
    integer accumulation; 8- and 16-bit PCM supported. Multi-channel
    WAV is downmixed explicitly (per-frame channel mean via
    ``getnchannels()``) so segment boundaries land on FRAME boundaries —
    treating interleaved stereo as one mono stream would split L/R pairs
    and mix channels across segments (round-4 ADVICE #3). Non-WAV
    payloads raise (``wave.Error``) and degrade to the per-row error
    sentinel in ``extract_features`` — never a task failure (X5 analog).
    Codecs needing compressed formats (mp3/ogg) would slot behind the
    same registry seam."""
    import array as _array
    import io as _io
    import wave as _wave

    with _wave.open(_io.BytesIO(payload), "rb") as w:
        width = w.getsampwidth()
        n_ch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    if width == 2:
        samples = _array.array("h")
        samples.frombytes(frames[: len(frames) // 2 * 2])
        samples = list(samples)
        full = 32768.0
    elif width == 1:  # 8-bit WAV is unsigned, centered at 128
        samples = [s - 128 for s in frames]
        full = 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {width}")
    if n_ch > 1:
        # drop any ragged tail that is not a whole frame, then average
        # each interleaved frame's channels (exact: int sum / n_ch)
        whole = len(samples) // n_ch * n_ch
        samples = [
            sum(samples[i : i + n_ch]) / n_ch for i in range(0, whole, n_ch)
        ]
    n = len(samples)
    if n == 0:
        return [0.0] * N_FEATURES
    out = []
    for i in range(N_FEATURES):
        seg = samples[i * n // N_FEATURES : (i + 1) * n // N_FEATURES]
        if not seg:
            out.append(0.0)
            continue
        out.append((sum(s * s for s in seg) / len(seg)) ** 0.5 / full)
    return out


def _video_decode_features(payload: bytes) -> list:
    """Real video decode for uncompressed YUV4MPEG2 (y4m) — a public
    plain-bytes format parseable with ZERO dependencies: ``YUV4MPEG2``
    header line, then ``FRAME`` markers each followed by raw 4:2:0 YUV
    planes. Features: mean luma (Y plane) per temporal segment,
    N_FEATURES segments, normalized to [0, 1] — deterministic integer
    accumulation. Compressed containers (mp4/webm) raise and degrade to
    the per-row error sentinel; a real deployment registers an
    av/ffmpeg-backed codec behind this same registry seam."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = payload.index(b"\n")
    params = {}
    for tok in payload[10:nl].decode("ascii").split(" "):
        if tok:
            params[tok[0]] = tok[1:]
    w, h = int(params["W"]), int(params["H"])
    chroma = params.get("C", "420")
    if not chroma.startswith("420"):
        raise ValueError(f"unsupported chroma subsampling C{chroma}")
    ysize = w * h
    frame_size = ysize + 2 * ((w // 2) * (h // 2))
    pos = nl + 1
    luma_means = []
    while pos < len(payload):
        fnl = payload.index(b"\n", pos)
        if not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        data = payload[fnl + 1 : fnl + 1 + frame_size]
        if len(data) < frame_size:
            raise ValueError("truncated frame")
        luma_means.append(sum(data[:ysize]) / (ysize * 255.0))
        pos = fnl + 1 + frame_size
    if not luma_means:
        return [0.0] * N_FEATURES
    n = len(luma_means)
    out = []
    for i in range(N_FEATURES):
        seg = luma_means[i * n // N_FEATURES : (i + 1) * n // N_FEATURES]
        out.append(sum(seg) / len(seg) if seg else 0.0)
    return out


# --- compression envelopes (stdlib, zero-dependency) -------------------
#
# Real corpora often store media payloads wrapped in a stream
# compressor (gzip/bz2/xz) independent of the inner media format. These
# ENVELOPES are fully decodable with the standard library, so the
# registry handles them for real: magic-sniff → decompress → decode the
# inner payload with the same codec. This is honest scope: envelope
# compression (gzip around a WAV) is not codec compression (MP3/H.264) —
# the latter still degrade to per-row error sentinels until a real
# media lib is registered.

_ENVELOPE_MAGIC = (
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bz2"),
    (b"\xfd7zXZ\x00", "xz"),
)
# decompression-bomb guard: refuse to inflate past this many bytes —
# a malicious 10^6:1 bomb degrades to the per-row error sentinel
# instead of an executor OOM
MAX_DECOMPRESSED_BYTES = 64 * 1024 * 1024


def _strip_envelope(payload: bytes) -> bytes:
    """Transparently decompress a gzip/bz2/xz envelope (bounded read);
    non-enveloped payloads pass through untouched."""
    for magic, kind in _ENVELOPE_MAGIC:
        if payload[: len(magic)] == magic:
            if kind == "gzip":
                import gzip as _gzip
                import io as _io

                with _gzip.GzipFile(fileobj=_io.BytesIO(payload)) as fh:
                    out = fh.read(MAX_DECOMPRESSED_BYTES + 1)
            elif kind == "bz2":
                import bz2 as _bz2

                out = _bz2.BZ2Decompressor().decompress(
                    payload, MAX_DECOMPRESSED_BYTES + 1
                )
            else:
                import lzma as _lzma

                out = _lzma.LZMADecompressor().decompress(
                    payload, MAX_DECOMPRESSED_BYTES + 1
                )
            if len(out) > MAX_DECOMPRESSED_BYTES:
                raise ValueError(
                    f"{kind} payload inflates past "
                    f"{MAX_DECOMPRESSED_BYTES} bytes — refusing "
                    "(decompression bomb guard)"
                )
            return out
    return payload


def _with_envelope(decode: Callable[[bytes], list]) -> Callable[[bytes], list]:
    def run(payload: bytes) -> list:
        return decode(_strip_envelope(payload))

    return run


CODECS: Dict[str, Callable[[bytes], list]] = {
    "fake": _fake_decode_features,
    "image": _with_envelope(
        _image_decode_features if _PILImage is not None else _real_decode
    ),
    "audio": _with_envelope(_audio_decode_features),
    "video": _with_envelope(_video_decode_features),
}


def gen_y4m_bytes(
    width: int = 16, height: int = 16, n_frames: int = 24, seed: int = 11
) -> bytes:
    """Deterministic uncompressed YUV4MPEG2 clip: per-frame luma ramps
    dark → bright (so temporal features are monotone), chroma neutral;
    a splitmix-style stream adds per-pixel texture."""
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode())
    x = seed & 0xFFFFFFFFFFFFFFFF
    csize = (width // 2) * (height // 2)
    for i in range(n_frames):
        out += b"FRAME\n"
        base = (i * 200) // max(n_frames - 1, 1) + 20  # 20..220 ramp
        y = bytearray()
        for _ in range(width * height):
            x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            y.append(max(0, min(255, base + (x >> 40) % 21 - 10)))
        out += bytes(y)
        out += bytes([128]) * (2 * csize)
    return bytes(out)


def gen_wav_bytes(
    n_samples: int = 800, rate: int = 8000, seed: int = 7, n_channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV (stdlib only) — a real, parseable
    audio payload for tests and demos: a ramp-modulated square-ish wave
    derived from a splitmix-style integer stream. ``n_channels > 1``
    interleaves per-channel variants of the same frame (the stereo
    downmix test fixture)."""
    import io as _io
    import struct as _struct
    import wave as _wave

    buf = _io.BytesIO()
    x = seed & 0xFFFFFFFFFFFFFFFF
    frames = bytearray()
    for i in range(n_samples):
        x = (x * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        # amplitude ramps 0..20000 so per-segment RMS is monotone;
        # sign alternates so the signal is a genuine waveform
        amp = (i * 20000) // max(n_samples - 1, 1)
        sign = 1 if (i // 4) % 2 == 0 else -1
        jitter = (x >> 33) % 997 - 498
        for c in range(n_channels):
            # channels differ by a deterministic per-channel offset so a
            # naive interleaved read cannot accidentally match the mix
            frames += _struct.pack(
                "<h",
                max(-32768, min(32767, sign * amp + jitter + c * 600 - 300 * (n_channels - 1))),
            )
    with _wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(frames))
    return buf.getvalue()


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
