"""Multimodal column operators: decode / feature-extract / frame-sample.

Media payloads are opaque ``binary`` columns with a typed metadata
struct (sources/binaryfile.py MEDIA_SCHEMA). All heavy per-record work
runs as Arrow-batched Pandas functions over ``mapInPandas`` — the
engine's sanctioned slow path (SURVEY §2.4 note a): the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the
actual codec calls are stubbed because image/audio libraries are not in
this container.

- ``decode_media``: container-header decode is REAL and dependency-free
  — ``parse_media_header`` reads true dimensions / sample rates out of
  PNG, GIF, BMP, JPEG and WAV headers with ``struct`` alone, so the
  registered queries exercise genuine decoding in this container. Full
  pixel/sample decode of arbitrary payloads stays PIL-backed
  (import-gated); ``fake=True`` lets unrecognized payloads fall back to
  a deterministic stand-in (byte-derived pseudo-dimensions) instead of
  raising, so plumbing tests run on any bytes.
- ``extract_features``: per-payload signature/stats (deterministic).
- ``sample_frames``: 1 row -> N rows fan-out (frame sampling shape).

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; payload columns never pass through
Python row-at-a-time. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch; for ~MB payloads set it
low (e.g. 64) in cluster conf to bound task memory.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, crc32 long, "
    "sig string, width int, height int, fmt string, sample_rate int"
)

FRAME_SCHEMA = "media_id long, frame_idx int, frame_bytes long, frame_crc long"


def _try_real_decoder():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def _fake_dims(payload: bytes) -> tuple[int, int]:
    # Deterministic stand-in for a codec's (width, height).
    return (len(payload) % 640) + 1, (zlib.crc32(payload) % 480) + 1


def parse_media_header(b: bytes) -> dict | None:
    """True container-header decode with stdlib ``struct`` only — the
    real (no-dependency) half of the decode ladder. Recognizes:

    - PNG  (IHDR width/height, big-endian)
    - GIF  (87a/89a logical-screen width/height, little-endian)
    - BMP  (BITMAPINFOHEADER or BITMAPCOREHEADER dims)
    - JPEG (SOFn frame height/width via marker scan)
    - WAV  (RIFF/WAVE ``fmt `` chunk: channels + sample rate)

    Returns ``{"fmt", "width", "height"}`` for images,
    ``{"fmt", "sample_rate", "n_channels"}`` for WAV, or None when no
    known signature matches (truncated/garbled headers included)."""
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return {"fmt": "png", "width": w, "height": h}
        if b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            return {"fmt": "gif", "width": w, "height": h}
        if b[:2] == b"BM" and len(b) >= 26:
            hdr_size = struct.unpack("<I", b[14:18])[0]
            if hdr_size >= 40:  # BITMAPINFOHEADER+: signed dims, height
                w, h = struct.unpack("<ii", b[18:26])  # may be top-down
                return {"fmt": "bmp", "width": w, "height": abs(h)}
            if hdr_size == 12:  # BITMAPCOREHEADER: unsigned 16-bit dims
                w, h = struct.unpack("<HH", b[18:22])
                return {"fmt": "bmp", "width": w, "height": h}
            return None
        if b[:2] == b"\xff\xd8":
            i = 2
            while i + 9 < len(b):
                if b[i] != 0xFF:
                    return None
                # JPEG allows any number of 0xFF fill bytes before a
                # marker — skip them (a bare 0xFF is never a marker id)
                while i + 9 < len(b) and b[i + 1] == 0xFF:
                    i += 1
                marker = b[i + 1]
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    i += 2  # standalone markers have no length field
                    continue
                seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    return {"fmt": "jpeg", "width": w, "height": h}
                i += 2 + seg_len
            return None
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                c_len = struct.unpack("<I", b[i + 4 : i + 8])[0]
                if cid == b"fmt " and c_len >= 16:
                    ch, sr = struct.unpack("<HI", b[i + 10 : i + 16])
                    return {"fmt": "wav", "sample_rate": sr, "n_channels": ch}
                i += 8 + c_len + (c_len & 1)  # chunks are 2-byte aligned
            return None
    except struct.error:
        return None
    return None


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload -> features. Header-level decode (dims / sample rate for
    PNG, GIF, BMP, JPEG, WAV) is real and dependency-free via
    :func:`parse_media_header`. Payloads with no recognized header need
    a full codec: PIL when present (import-gated), else the
    deterministic ``fake=True`` stand-in, else a per-payload
    NotImplementedError at execution time (header-decodable corpora
    therefore run with no codec installed at all)."""
    decoder = _try_real_decoder()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["meta"].apply(lambda m: m["media_type"]), payloads
            ):
                b = bytes(payload)
                parsed = parse_media_header(b)
                if parsed is not None:
                    fmt = parsed["fmt"]
                    w, h = parsed.get("width"), parsed.get("height")
                    sr = parsed.get("sample_rate")
                elif decoder is not None:
                    import io

                    img = decoder.open(io.BytesIO(b))
                    w, h = img.size
                    fmt, sr = (img.format or "").lower(), None
                elif fake:
                    w, h = _fake_dims(b)
                    fmt, sr = None, None
                else:
                    # Deferred per-payload: header-decodable payloads
                    # never reach here, so a PNG/WAV-only corpus works
                    # with no codec at all; only a genuinely opaque
                    # payload with no PIL and no fake fallback errors.
                    raise NotImplementedError(
                        f"payload for media_id={mid} has no parseable "
                        "container header and no full image codec is "
                        "available; pass fake=True for the "
                        "deterministic stand-in decoder"
                    )
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": len(b),
                        "crc32": zlib.crc32(b),
                        "sig": b[:8].hex(),
                        "width": w,
                        "height": h,
                        "fmt": fmt,
                        "sample_rate": sr,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "crc32",
                    "sig", "width", "height", "fmt", "sample_rate",
                ],
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """1 payload -> n_frames rows (frame-sampling batch shape): each
    'frame' is a deterministic byte-slice of the payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    chunk = b[i * step : (i + 1) * step]
                    if not chunk:
                        break
                    rows.append(
                        {
                            "media_id": mid,
                            "frame_idx": i,
                            "frame_bytes": len(chunk),
                            "frame_crc": zlib.crc32(chunk),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_crc"]
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "media_id long, width int, height int, out_bytes long, out_crc long"
)


def resize_media(
    df: DataFrame, width: int = 64, height: int = 64, fake: bool = False
) -> DataFrame:
    """payload -> resized payload metadata at (width, height). Real
    codec path requires PIL (import-gated, not in this container);
    ``fake=True`` emits a deterministic stand-in 'resized' payload (a
    byte-stride downsample of the original sized w*h/16) so the
    1-in-1-out transform plumbing — schema, Arrow batching, constant
    memory per task — is exercisable end-to-end anywhere."""
    decoder = _try_real_decoder()
    if decoder is None and not fake:
        raise NotImplementedError(
            "no image codec available in this environment; "
            "pass fake=True to exercise the pipeline with the "
            "deterministic stand-in resizer"
        )
    target = max(1, width * height // 16)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                stride = max(1, len(b) // target)
                out = b[::stride][:target]
                rows.append(
                    {
                        "media_id": mid,
                        "width": width,
                        "height": height,
                        "out_bytes": len(out),
                        "out_crc": zlib.crc32(out),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "out_bytes", "out_crc"],
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def _be32(c: Column) -> Column:
    """int column -> 4 bytes big-endian (hex -> unhex round trip)."""
    return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))


def _hexswap(hx: Column, n_bytes: int) -> Column:
    """hex string column -> bytes with byte order reversed (-> LE)."""
    parts = [F.substring(hx, 2 * i + 1, 2) for i in reversed(range(n_bytes))]
    return F.unhex(F.concat(*parts))


def _le32(c: Column) -> Column:
    return _hexswap(F.lpad(F.hex(c.cast("bigint")), 8, "0"), 4)


def _le16(c: Column) -> Column:
    return _hexswap(F.lpad(F.hex(c.cast("bigint")), 4, "0"), 2)


def _fabricated_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text wrapped in REAL container headers — a media corpus
    stand-in whose payloads the stdlib header decoder genuinely parses.
    Even doc_ids become PNG payloads (true IHDR dims derived from
    doc_id), odd doc_ids become WAV payloads (true fmt-chunk sample
    rate); the document text rides along as the 'pixel/sample' body.
    Header synthesis is a JVM-side binary concat — no Python until the
    decode step under test."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # PNG: signature + IHDR length/type + 13-byte IHDR payload
    # (width, height big-endian; bit depth 8, color type 2, rest 0).
    w = (F.col("doc_id") % 640 + 1).cast("int")
    h = (F.col("doc_id") % 480 + 1).cast("int")
    png_header = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        F.lit(b"\x00\x00\x00\x0dIHDR"),
        _be32(w),
        _be32(h),
        F.lit(b"\x08\x02\x00\x00\x00"),
    )
    # WAV: RIFF/WAVE + 16-byte fmt chunk (PCM, 1 channel, little-endian
    # sample rate derived from doc_id).
    sr = (F.col("doc_id") % 48000 + 8000).cast("int")
    wav_header = F.concat(
        F.lit(b"RIFF"),
        _le32(F.lit(36)),
        F.lit(b"WAVEfmt "),
        _le32(F.lit(16)),
        _le16(F.lit(1)),  # PCM
        _le16(F.lit(1)),  # mono
        _le32(sr),
        _le32(sr),  # byte rate (1 ch * 1 B)
        _le16(F.lit(1)),
        _le16(F.lit(8)),
    )
    is_png = F.col("doc_id") % 2 == 0
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(
            F.when(is_png, png_header).otherwise(wav_header),
            F.encode("text", "utf-8"),
        ).alias("payload"),
        F.struct(
            F.when(is_png, "image").otherwise("audio").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode-pipeline drive: fabricate PNG/WAV payloads, run the
    Pandas-UDF header decode, aggregate. Rows-only check (crc32 has no
    DuckDB twin); ``fmt`` being non-null for every row pins that the
    REAL header parser (not the stand-in) produced the features."""
    feats = decode_media(_fabricated_media(spark, sf_dir), fake=True)
    return (
        feats.groupBy("media_type", "fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("crc32").alias("distinct_payloads"),
            F.max("width").alias("max_width"),
            F.max("sample_rate").alias("max_sample_rate"),
        )
        .orderBy("media_type", "fmt")
    )


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out drive (1 -> 4 rows per payload)."""
    frames = sample_frames(_fabricated_media(spark, sf_dir), n_frames=4)
    return (
        frames.groupBy("frame_idx")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("frame_bytes").alias("bytes"))
        .orderBy("frame_idx")
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize-transform drive (1 payload -> 1 resized record)."""
    resized = resize_media(_fabricated_media(spark, sf_dir), fake=True)
    return resized.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("out_bytes").alias("total_out_bytes"),
        F.countDistinct("out_crc").alias("distinct_outputs"),
    )


QUERIES = [
    QuerySpec("multimodal_features", multimodal_features, None,
              "binary payload -> Pandas-UDF feature extraction (rows-only)",
              ("multimodal", "pandas-udf")),
    QuerySpec("multimodal_frame_sample", multimodal_frame_sample, None,
              "frame-sampling fan-out via mapInPandas (rows-only)",
              ("multimodal", "pandas-udf")),
    QuerySpec("multimodal_resize", multimodal_resize, None,
              "deterministic resize transform via mapInPandas (rows-only)",
              ("multimodal", "pandas-udf")),
]
