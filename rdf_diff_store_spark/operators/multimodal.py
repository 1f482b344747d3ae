"""Multimodal column operators: image/audio/video as opaque `binary`
columns with typed metadata, processed through mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition-size
control) is real and tested. Image decoding is REAL for PNG — a
pure-stdlib codec below (zlib inflate + full filter reconstruction,
8-bit gray/RGB/RGBA, non-interlaced, CRC-checked) — and for anything
PIL handles when PIL is installed; other formats fall back to a
clearly-marked deterministic fake so the plumbing stays exercised in
dependency-free environments. On a real cluster you swap in a native
decoder (torchvision / libvips) by replacing `_decode_image` only —
no Spark code changes.

Scale notes: media rows are fat — the operators repartition by a
size-aware key so one Arrow batch never exceeds executor memory
(`maxRecordsPerBatch` is set per-operator, not globally), and the
metadata extraction path never deserializes payload bytes it doesn't
need (column pruning keeps `payload` out of metadata-only plans).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = {0: 1, 2: 3, 6: 4}  # color type -> bytes per pixel (8-bit)


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the per-scanline PNG filters (spec §9: None/Sub/Up/
    Average/Paeth) — the decode step proper, after inflate."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pr) & 0xFF
        elif ft != 0:
            raise ValueError(f"unsupported PNG filter type {ft}")
        out += line
        prev = line
    return bytes(out)


def decode_png(payload: bytes) -> tuple[int, int, bytes]:
    """Real PNG decode, stdlib only: returns (width, height, pixel
    bytes in scanline order). Supports 8-bit depth, color types 0
    (gray) / 2 (RGB) / 6 (RGBA), non-interlaced; chunk CRCs are
    verified. Anything else raises loudly."""
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, meta = 8, b"", None
    while pos + 12 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8 or ctype not in _PNG_BPP or interlace != 0:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={ctype}, "
                    f"interlace={interlace}); supported: 8-bit gray/RGB/RGBA, "
                    "non-interlaced"
                )
            meta = (w, h, _PNG_BPP[ctype])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("PNG has no IHDR chunk")
    w, h, bpp = meta
    return w, h, _png_unfilter(zlib.decompress(idat), w, h, bpp)


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """Minimal PNG writer (filter 0 rows) — the test/synthetic-data
    twin of decode_png, so the real decode path is exercised without
    any external image dependency."""
    bpp = _PNG_BPP[color_type]
    if len(pixels) != width * height * bpp:
        raise ValueError("pixel buffer does not match dimensions")
    stride = width * bpp
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )

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


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Real WAV decode, stdlib only: RIFF/WAVE container, PCM 16-bit.
    Returns (sample_rate, n_channels, samples as host ints,
    interleaved). Anything non-PCM16 raises loudly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (format={fmt}, bits={bits}); "
                    "supported: PCM 16-bit"
                )
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return rate, channels, samples


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Minimal PCM16 WAV writer — the test/synthetic twin of
    decode_wav."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_image(payload: bytes) -> tuple[int, int]:
    """Image payload → (width, height).

    PNG payloads take the REAL stdlib decode above; with PIL installed
    other formats decode for real too. For non-image bytes the
    deterministic fallback derives dimensions from the payload so the
    Spark plumbing stays exercised end-to-end in dependency-free
    environments. Swapping in a GPU / torchvision decoder touches only
    this function — no Spark code."""
    if payload is None or len(payload) < 2:
        raise NotImplementedError("image decoding needs at least 2 payload bytes")
    if payload[:8] == PNG_SIGNATURE:
        w, h, _ = decode_png(payload)
        return (w, h)
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

    Output: (media_id, dec_width, dec_height, mean_byte) — for PNG
    payloads mean_byte is the mean of the DECODED pixel values (a real
    feature over real pixels); for fallback payloads it is the raw
    payload mean, the deterministic stand-in."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, means = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:8] == PNG_SIGNATURE:
                    w, h, pix = decode_png(payload)
                    mean = float(sum(pix) / len(pix)) if pix else 0.0
                else:
                    w, h = _decode_image(payload)
                    mean = float(sum(payload) / len(payload))
                ids.append(mid)
                ws.append(w)
                hs.append(h)
                means.append(mean)
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


def resize_png(payload: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a PNG payload: real decode →
    integer-index resample (src = (dst·src_dim) div dst_dim, exact
    integer arithmetic, so results are bit-reproducible everywhere) →
    re-encode. Pure stdlib+numpy; the sandbox stand-in for a
    Pillow/torchvision transform with the identical batch plumbing."""
    import numpy as np  # noqa: PLC0415

    if out_w <= 0 or out_h <= 0:
        raise ValueError(f"bad target size {out_w}x{out_h}")
    w, h, pix = decode_png(payload)
    bpp = len(pix) // (w * h)
    arr = np.frombuffer(pix, dtype=np.uint8).reshape(h, w, bpp)
    iy = (np.arange(out_h) * h) // out_h
    ix = (np.arange(out_w) * w) // out_w
    out = arr[np.ix_(iy, ix)]
    ctype = {1: 0, 3: 2, 4: 6}[bpp]
    return encode_png(out_w, out_h, out.tobytes(), ctype)


def image_resize(
    media: DataFrame, out_w: int, out_h: int, batch_rows: int = 64
) -> DataFrame:
    """Distributed image resize via mapInPandas — the third leg of the
    decode / feature-extract / RESIZE / frame-sample multimodal set.
    Output: (media_id, width, height, payload) with payload the
    re-encoded PNG. Same Arrow-batch cap discipline as image_features
    (fat payloads can't blow a batch); map-only, no shuffle — resize
    of 10^10 images is embarrassingly parallel and the only knob that
    matters is batch_rows × payload size vs executor memory."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, outs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                payload = bytes(payload)
                if payload[:8] != PNG_SIGNATURE:
                    continue  # non-PNG media: no real codec in sandbox
                ids.append(mid)
                outs.append(resize_png(payload, out_w, out_h))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "width": [out_w] * len(ids),
                    "height": [out_h] * len(ids),
                    "payload": outs,
                }
            )

    spark = media.sparkSession
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    try:
        out = (
            media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(
                _resize, "media_id long, width int, height int, payload binary"
            )
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    return out


def audio_features(media: DataFrame, batch_rows: int = 64) -> DataFrame:
    """Decode + feature-extract PCM16 WAV audio via mapInPandas:
    (media_id, sample_rate, n_samples, duration_ms, rms). RMS is
    computed over the DECODED samples in exact float64 (sum of squares
    < 2^53) with one correctly-rounded sqrt, so an arithmetic oracle
    reproduces it bit-for-bit."""
    import math

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "sample_rate": [], "n_samples": [],
                "duration_ms": [], "rms": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                rate, channels, samples = decode_wav(bytes(payload))
                n = len(samples)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // (rate * channels))
                rows["rms"].append(
                    math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
                )
            yield pd.DataFrame(rows)

    spark = media.sparkSession
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_rows))
    try:
        out = (
            media.filter(F.col("kind") == "audio")
            .select("media_id", "payload")
            .mapInPandas(
                _features,
                "media_id long, sample_rate int, n_samples int, duration_ms long, rms double",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
        else:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
    return out


def synthetic_wav_media(spark, n: int = 24) -> DataFrame:
    """Deterministic media table whose audio payloads are REAL PCM16
    WAVs (encode_wav), generated distributed: sample k of clip i is
    ((i + 1) * (k * k + 7 * k)) % 65536 - 32768 — a closed form an
    arithmetic oracle can reproduce."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "kind": [], "mime": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for i in pdf["id"]:
                i = int(i)
                n_samp = 80 + 8 * (i % 10)
                samples = [
                    ((i + 1) * (k * k + 7 * k)) % 65536 - 32768
                    for k in range(n_samp)
                ]
                rows["media_id"].append(i)
                rows["kind"].append("audio")
                rows["mime"].append("audio/wav")
                rows["payload"].append(encode_wav(8000, 1, samples))
                rows["width"].append(None)
                rows["height"].append(None)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


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


def synthetic_png_media(spark, n: int = 32) -> DataFrame:
    """Deterministic media table whose image payloads are REAL PNGs
    (encode_png), generated distributed via mapInPandas — the full
    decode path (inflate, unfilter, CRC) runs on real image bytes with
    zero external dependencies."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "kind": [], "mime": [], "payload": [],
                "width": [], "height": [], "duration_ms": [],
            }
            for i in pdf["id"]:
                i = int(i)
                w, h = 4 + i % 5, 3 + i % 4
                pix = bytes((i * 31 + k * 7) % 256 for k in range(w * h * 3))
                rows["media_id"].append(i)
                rows["kind"].append("image")
                rows["mime"].append("image/png")
                rows["payload"].append(encode_png(w, h, pix))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["duration_ms"].append(None)
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, MEDIA_SCHEMA)


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
