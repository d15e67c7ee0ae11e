"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. Decode is REAL for the
formats that need no codec libraries — PCM WAV (RIFF chunk walk), 24-bit
BMP and binary PPM (header math + numpy frombuffer) — plus a
nearest-neighbor ``resize_image``. Codec-dependent formats (PNG/JPEG/MP4)
fall back to a clearly-marked deterministic fake (or raise when
``deterministic_fake=False``): those decoders genuinely require
PIL/av, absent from this container. Corrupt payloads of real formats are
data, not errors: ``decode_ok=false``.

Schema convention:
    payload: binary, media_type: string ('image/png', 'audio/wav', ...),
    meta: struct<width:int, height:int, duration_ms:int>
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
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
        T.StructField("media_type", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def synthetic_media(spark, n: int, payload_bytes: int = 256) -> DataFrame:
    """Deterministic fake media table (seeded by id) for tests/benches."""
    df = spark.range(n).withColumnRenamed("id", "media_id")
    payload = F.sha2(F.col("media_id").cast("string"), 256).cast("binary")
    mt = F.element_at(
        F.array(F.lit("image/png"), F.lit("audio/wav"), F.lit("video/mp4")),
        (F.pmod(F.col("media_id"), F.lit(3)) + 1).cast("int"),
    )
    meta = F.struct(
        (F.pmod(F.col("media_id"), F.lit(512)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("media_id") * 3, F.lit(512)) + 32).cast("int").alias("height"),
        (F.pmod(F.col("media_id") * 7, F.lit(60000))).cast("int").alias("duration_ms"),
    )
    return df.select(
        "media_id", payload.alias("payload"), mt.alias("media_type"), meta.alias("meta")
    )


def decode_bmp(payload: bytes):
    """REAL decode of uncompressed 24-bit BMP (BITMAPINFOHEADER) →
    numpy (H, W, 3) uint8 RGB. Pure header math + frombuffer — no
    image libs. Bottom-up row order and 4-byte row padding handled."""
    import struct

    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    need = pixel_off + row_bytes * height
    if len(payload) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=pixel_off
    ).reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


def decode_ppm(payload: bytes):
    """REAL decode of binary PPM (P6) → numpy (H, W, 3) uint8."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    need = w * h * 3
    if len(payload) - i < need:
        raise ValueError("truncated PPM")
    return (
        np.frombuffer(payload, dtype=np.uint8, count=need, offset=i)
        .reshape(h, w, 3)
        .copy()
    )


def decode_wav(payload: bytes):
    """REAL decode of PCM WAV (RIFF/WAVE, 8/16-bit) → (samples float32
    in [-1, 1] mixed to mono, sample_rate, n_channels). RIFF chunk walk
    + numpy frombuffer — no audio libs."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    i, fmt, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16) or channels < 1:
        raise ValueError(f"unsupported WAV (fmt={audio_format}, bits={bits})")
    if bits == 16:
        x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    else:
        x = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    n = (len(x) // channels) * channels
    mono = x[:n].reshape(-1, channels).mean(axis=1)
    return mono, rate, channels


def resize_image(arr, out_w: int, out_h: int):
    """Nearest-neighbor resize of an (H, W, C) array — index arithmetic
    only, the honest no-deps resize."""
    import numpy as np

    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


def _image_features(arr) -> list[float]:
    """8-dim image descriptor: dims, per-channel means, gray std,
    aspect, edge-energy proxy."""
    import numpy as np

    h, w = arr.shape[:2]
    f = arr.astype("float32") / 255.0
    gray = f.mean(axis=2)
    dx = float(np.abs(np.diff(gray, axis=1)).mean()) if w > 1 else 0.0
    return [
        float(w) / 4096.0, float(h) / 4096.0,
        float(f[:, :, 0].mean()), float(f[:, :, 1].mean()),
        float(f[:, :, 2].mean()), float(gray.std()),
        float(w) / max(h, 1), dx,
    ]


def _audio_features(mono, rate: int, channels: int) -> list[float]:
    """8-dim audio descriptor: duration, rate, rms, zero-crossing rate,
    mean |x|, peak, channels."""
    import numpy as np

    n = len(mono)
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    return [
        n / max(rate, 1) / 60.0, rate / 48000.0,
        float(np.sqrt((mono ** 2).mean())) if n else 0.0, zcr,
        float(np.abs(mono).mean()) if n else 0.0,
        float(np.abs(mono).max()) if n else 0.0,
        float(channels) / 8.0, 0.0,
    ]


def _decode_one(payload: bytes, media_type: str, deterministic_fake: bool):
    """Decode one payload. WAV/BMP/PPM decode is REAL (pure header math +
    numpy, above); PNG/JPEG/MP4 genuinely need codec libs absent from
    this container — those fall back to the deterministic fake (stable
    8-dim hash feature) when allowed, else raise."""
    if payload:
        if payload[:4] == b"RIFF":
            return _audio_features(*decode_wav(payload))
        if payload[:2] == b"BM":
            return _image_features(decode_bmp(payload))
        if payload[:2] == b"P6":
            return _image_features(decode_ppm(payload))
    if not deterministic_fake:
        raise NotImplementedError(
            f"decode of {media_type!r} requires codec libs (PIL/av) — not "
            "available; WAV/BMP/PPM decode natively, or run with "
            "deterministic_fake=True for the plumbing path"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [float(b) / 255.0 for b in h[:8]]


# kept name for callers/tests of the fallback path
_decode_stub = _decode_one


def extract_features(
    df: DataFrame, deterministic_fake: bool = True, batch_hint: int = 1024
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches out.

    At scale: decode cost dominates, so partitions should be sized by
    payload bytes (`spark.sql.files.maxPartitionBytes` low for media
    tables) and the stage is a narrow map — no shuffle.
    """

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats, oks = [], []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                try:
                    feats.append(_decode_stub(payload, mt, deterministic_fake))
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:  # noqa: BLE001 — corrupt payloads are data
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per target frame
    timestamp (the decode itself is the stub above). Pure built-ins —
    sequence + explode; shows the fan-out shape for frame pipelines."""
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("media_type").startswith("video/"))
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(n_frames - 1, F.lit(0)) * every_ms,
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "media_type", "frame_ms")
    )
