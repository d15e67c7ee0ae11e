"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The decode step itself is
STUBBED (no image/audio libs in this container — the stub raises
``NotImplementedError`` unless ``deterministic_fake=True``), but the
Spark-side plumbing — schema, batch iteration, partition sizing, UDF
signatures — is real and tested.

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


def _decode_stub(payload: bytes, media_type: str, deterministic_fake: bool):
    """Decode one payload. REAL decoders (PIL/soundfile/av) are not in
    this container — the deterministic fake derives a stable 8-dim
    feature from the payload hash so plumbing is testable end-to-end."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decode requires PIL/soundfile/av — not available; "
            "run with deterministic_fake=True for the plumbing path"
        )
    h = hashlib.sha256(payload or b"").digest()
    return [float(b) / 255.0 for b in h[:8]]


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
