"""Multimodal plumbing: binaryFile source, Pandas-UDF decode pipeline,
frame-sampling fan-out — with real bytes on disk and deterministic
stand-in codecs (no image libs in this container)."""

import zlib

import pytest

from distributed_map_reduce_spark.operators.multimodal import (
    _try_real_decoder,
    decode_media,
    sample_frames,
)
from distributed_map_reduce_spark.sources.binaryfile import (
    media_from_binary_files,
    read_binary_dir,
)

PAYLOADS = {
    "a.img": b"\x89PNG-fake-payload-aaaaaaaaaaaaaaaa",
    "b.img": b"\xff\xd8JPEG-fake-payload-bbbb",
    "c.txt": b"not-an-image",
}


@pytest.fixture()
def media_dir(tmp_path):
    for name, blob in PAYLOADS.items():
        (tmp_path / name).write_bytes(blob)
    return str(tmp_path)


def test_binaryfile_source_reads_whole_files(spark, media_dir):
    df = read_binary_dir(spark, media_dir, glob="*.img")
    rows = {r["path"].rsplit("/", 1)[-1]: bytes(r["content"]) for r in df.collect()}
    assert rows == {k: v for k, v in PAYLOADS.items() if k.endswith(".img")}


def test_decode_pipeline_deterministic(spark, media_dir):
    media = media_from_binary_files(
        read_binary_dir(spark, media_dir, glob="*.img"), "image"
    )
    feats = {r["sig"]: r for r in decode_media(media, fake=True).collect()}
    for blob in [PAYLOADS["a.img"], PAYLOADS["b.img"]]:
        row = feats[blob[:8].hex()]
        assert row["n_bytes"] == len(blob)
        assert row["crc32"] == zlib.crc32(blob)
        assert 1 <= row["width"] <= 640 and 1 <= row["height"] <= 480
        assert row["media_type"] == "image"


def test_decode_requires_codec_or_fake(spark, media_dir):
    """Unparseable payloads with no codec and no fake fallback error
    per-payload at execution time (header-decodable payloads never
    need the gate — see test_decode_header_only_corpus_needs_no_codec)."""
    media = media_from_binary_files(
        read_binary_dir(spark, media_dir, glob="*.img"), "image"
    )
    if _try_real_decoder() is None:
        with pytest.raises(Exception, match="no parseable container header"):
            decode_media(media, fake=False).collect()
    else:
        pytest.skip("real codec present; stub gate not applicable")


def test_frame_sampling_fanout(spark, media_dir):
    media = media_from_binary_files(
        read_binary_dir(spark, media_dir, glob="*.img"), "video"
    )
    frames = sample_frames(media, n_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 2
    for rows in by_media.values():
        assert [r["frame_idx"] for r in sorted(rows, key=lambda x: x["frame_idx"])] == list(
            range(len(rows))
        )
        assert all(r["frame_bytes"] > 0 for r in rows)


def test_resize_transform_deterministic(spark, media_dir):
    from distributed_map_reduce_spark.operators.multimodal import resize_media

    media = media_from_binary_files(
        read_binary_dir(spark, media_dir, glob="*.img"), "image"
    )
    rows = {r["media_id"]: r for r in resize_media(media, fake=True).collect()}
    assert len(rows) == 2
    target = 64 * 64 // 16
    for r in rows.values():
        assert (r["width"], r["height"]) == (64, 64)
        assert 1 <= r["out_bytes"] <= target
    # deterministic: same inputs -> same output crcs on a second run
    again = {r["media_id"]: r for r in resize_media(media, fake=True).collect()}
    assert {k: v["out_crc"] for k, v in rows.items()} == {
        k: v["out_crc"] for k, v in again.items()
    }


# --- real stdlib header decoding (VERDICT r3 item 4) -------------------------

import struct

from distributed_map_reduce_spark.operators.multimodal import (
    _fabricated_media,
    multimodal_features,
    parse_media_header,
)

SF_SMOKE = "/root/testdata/sf0.001"


def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00")


def _wav(sr, ch):
    return (b"RIFF" + struct.pack("<I", 36) + b"WAVEfmt "
            + struct.pack("<I", 16) + struct.pack("<HH", 1, ch)
            + struct.pack("<I", sr) + struct.pack("<I", sr * ch)
            + struct.pack("<HH", ch, 8))


def test_parse_media_header_true_dimensions():
    assert parse_media_header(_png(320, 200)) == {
        "fmt": "png", "width": 320, "height": 200}
    assert parse_media_header(b"GIF89a" + struct.pack("<HH", 99, 44)) == {
        "fmt": "gif", "width": 99, "height": 44}
    bmp = (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
           + struct.pack("<ii", 640, -480))  # negative height = top-down
    assert parse_media_header(bmp) == {"fmt": "bmp", "width": 640, "height": 480}
    jpeg = (b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"
            + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 66, 77) + b"\x03" + b"\x00" * 3)
    assert parse_media_header(jpeg) == {"fmt": "jpeg", "width": 77, "height": 66}
    assert parse_media_header(_wav(22050, 2)) == {
        "fmt": "wav", "sample_rate": 22050, "n_channels": 2}


def test_parse_media_header_rejects_garbage():
    for b in (b"", b"plain text", b"\x89PNG\r\n\x1a\n\x00\x00",  # truncated
              b"\xff\xd8not-jpeg", b"RIFFxxxxWAVE", b"BM\x00"):
        assert parse_media_header(b) is None


def test_decode_media_real_dims_on_synthesized_payloads(spark, tmp_path):
    (tmp_path / "p.img").write_bytes(_png(512, 384))
    (tmp_path / "w.img").write_bytes(_wav(44100, 1))
    media = media_from_binary_files(
        read_binary_dir(spark, str(tmp_path), glob="*.img"), "image"
    )
    rows = {r["fmt"]: r for r in decode_media(media, fake=True).collect()}
    assert rows["png"]["width"] == 512 and rows["png"]["height"] == 384
    assert rows["wav"]["sample_rate"] == 44100
    assert rows["wav"]["width"] is None  # audio has no dims


def test_fabricated_corpus_decodes_with_true_headers(spark):
    """The registered multimodal queries run the REAL header parser:
    every fabricated payload must parse (fmt non-null) with dims/rate
    matching the synthesis formula."""
    import pyspark.sql.functions as F

    feats = decode_media(_fabricated_media(spark, SF_SMOKE), fake=True)
    bad = feats.filter(
        F.col("fmt").isNull()
        | ((F.col("fmt") == "png")
           & (F.col("width") != F.col("media_id") % 640 + 1))
        | ((F.col("fmt") == "wav")
           & (F.col("sample_rate") != F.col("media_id") % 48000 + 8000))
    ).count()
    assert bad == 0
    fmts = {r["fmt"] for r in multimodal_features(spark, SF_SMOKE).collect()}
    assert fmts == {"png", "wav"}


def test_decode_header_only_corpus_needs_no_codec(spark, tmp_path):
    """A corpus whose payloads all carry parseable container headers
    decodes fully with fake=False and no image library installed."""
    (tmp_path / "p.img").write_bytes(_png(320, 200))
    (tmp_path / "w.img").write_bytes(_wav(8000, 1))
    media = media_from_binary_files(
        read_binary_dir(spark, str(tmp_path), glob="*.img"), "image"
    )
    rows = {r["fmt"]: r for r in decode_media(media, fake=False).collect()}
    assert rows["png"]["width"] == 320
    assert rows["wav"]["sample_rate"] == 8000


def test_parse_media_header_jpeg_fill_bytes():
    """JPEG allows 0xFF fill bytes before a marker — the scanner must
    skip them, not misread the marker byte as a segment length."""
    jpeg = (b"\xff\xd8" + b"\xff\xff\xff\xe0" + struct.pack(">H", 4)
            + b"\x00\x00" + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 10, 20) + b"\x03" + b"\x00" * 3)
    assert parse_media_header(jpeg) == {"fmt": "jpeg", "width": 20, "height": 10}
