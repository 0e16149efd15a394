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


def test_fabricated_corpus_decodes_with_true_headers(spark, sf_dir):
    """The registered multimodal queries run the REAL header parser:
    every fabricated payload must parse (fmt non-null) with dims/rate
    matching the synthesis formula."""
    import pyspark.sql.functions as F

    feats = decode_media(_fabricated_media(spark, sf_dir), fake=True)
    bad = feats.filter(
        F.col("fmt").isNull()
        | ((F.col("fmt") == "png")
           & (F.col("width") != F.col("media_id") % 640 + 1))
        | ((F.col("fmt") == "wav")
           & (F.col("sample_rate") != F.col("media_id") % 48000 + 8000))
        | ((F.col("fmt") == "bmp")
           & (F.col("width") != 4 * (F.col("media_id") % 4 + 1)))
    ).count()
    assert bad == 0
    fmts = {r["fmt"] for r in multimodal_features(spark, sf_dir).collect()}
    assert fmts == {"png", "wav", "bmp"}


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


# --- real stdlib pixel/sample decoding (VERDICT r4 item 3) -------------------

from distributed_map_reduce_spark.operators.multimodal import (
    decode_bmp_pixels,
    decode_wav_samples,
    resize_media,
)


def _bmp24(pixels_rgb):
    """rows of RGB tuples (top-down) -> uncompressed bottom-up 24bpp BMP."""
    h, w = len(pixels_rgb), len(pixels_rgb[0])
    stride = (3 * w + 3) // 4 * 4
    body = b""
    for row in reversed(pixels_rgb):  # bottom-up storage
        raw = b"".join(bytes([b_, g, r]) for (r, g, b_) in row)  # BGR
        body += raw + b"\x00" * (stride - len(raw))
    return (b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4
            + struct.pack("<I", 54) + struct.pack("<I", 40)
            + struct.pack("<ii", w, h) + struct.pack("<HH", 1, 24)
            + struct.pack("<I", 0) + struct.pack("<I", len(body))
            + b"\x00" * 16 + body)


def _wav16(sr, samples):
    data = struct.pack(f"<{len(samples)}h", *samples)
    return (b"RIFF" + struct.pack("<I", 36 + 8 + len(data)) + b"WAVEfmt "
            + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_decode_bmp_pixels_true_values():
    px = [[(10, 20, 30), (40, 50, 60)],
          [(70, 80, 90), (100, 110, 120)]]
    arr = decode_bmp_pixels(_bmp24(px))
    assert arr.shape == (2, 2, 3)
    assert arr.tolist() == [[list(p) for p in row] for row in px]
    # odd width exercises row padding: stride 8 for 3*1=3 data bytes
    arr1 = decode_bmp_pixels(_bmp24([[(1, 2, 3)], [(4, 5, 6)]]))
    assert arr1.tolist() == [[[1, 2, 3]], [[4, 5, 6]]]


def test_decode_wav_samples_true_values():
    sr, samples = decode_wav_samples(_wav16(8000, [100, -200, 300, -400]))
    assert sr == 8000
    assert samples.ravel().tolist() == [100, -200, 300, -400]


def test_resize_true_pixel_stats_no_codec(spark, tmp_path):
    """A BMP corpus resizes with fake=False and NO image library: the
    stdlib pixel decode + nearest-neighbor resample computes true means.
    2x2 -> 1x1 nearest-neighbor keeps the top-left pixel exactly."""
    px = [[(12, 24, 36), (200, 200, 200)],
          [(90, 90, 90), (250, 250, 250)]]
    (tmp_path / "m.img").write_bytes(_bmp24(px))
    media = media_from_binary_files(
        read_binary_dir(spark, str(tmp_path), glob="*.img"), "image"
    )
    [row] = resize_media(media, width=1, height=1, fake=False).collect()
    assert row["out_bytes"] == 3
    assert row["out_crc"] == zlib.crc32(bytes([12, 24, 36]))
    assert row["mean_px"] == pytest.approx((12 + 24 + 36) / 3)
    # identity resize reproduces the full true pixel mean
    [row2] = resize_media(media, width=2, height=2, fake=False).collect()
    flat = [c for r in px for p in r for c in p]
    assert row2["mean_px"] == pytest.approx(sum(flat) / len(flat))


def test_frame_sample_true_rms(spark, tmp_path):
    """A PCM WAV corpus frame-samples through the REAL decode: per-frame
    RMS matches the hand-computed sample values."""
    samples = [30, -40, 0, 120, -120, 5, 6, 7]
    (tmp_path / "s.img").write_bytes(_wav16(16000, samples))
    media = media_from_binary_files(
        read_binary_dir(spark, str(tmp_path), glob="*.img"), "audio"
    )
    rows = sorted(
        sample_frames(media, n_frames=4).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
    for r, (a, b) in zip(rows, [(30, -40), (0, 120), (-120, 5), (6, 7)]):
        assert r["frame_bytes"] == 4  # 2 samples x 2 bytes
        assert r["rms"] == pytest.approx(((a * a + b * b) / 2) ** 0.5)


def test_parse_media_header_bmp_edge_cases():
    """Negative width is invalid (None); a minimal 22-byte
    BITMAPCOREHEADER parses."""
    bad = (b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
           + struct.pack("<ii", -640, 480))
    assert parse_media_header(bad) is None
    core = (b"BM" + b"\x00" * 12 + struct.pack("<I", 12)
            + struct.pack("<HH", 7, 9))
    assert len(core) == 22
    assert parse_media_header(core) == {"fmt": "bmp", "width": 7, "height": 9}


def test_parse_media_header_jpeg_fill_bytes():
    """JPEG allows 0xFF fill bytes before a marker — the scanner must
    skip them, not misread the marker byte as a segment length."""
    jpeg = (b"\xff\xd8" + b"\xff\xff\xff\xe0" + struct.pack(">H", 4)
            + b"\x00\x00" + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 10, 20) + b"\x03" + b"\x00" * 3)
    assert parse_media_header(jpeg) == {"fmt": "jpeg", "width": 20, "height": 10}


def _avi(w, h, n_frames):
    import struct

    avih = (
        struct.pack("<I", 33333)  # dwMicroSecPerFrame
        + b"\x00" * 12
        + struct.pack("<I", n_frames)  # dwTotalFrames @16
        + b"\x00" * 12
        + struct.pack("<II", w, h)  # dwWidth/dwHeight @32/@36
        + b"\x00" * 16
    )  # 56-byte main header
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def test_parse_media_header_avi():
    got = parse_media_header(_avi(320, 240, 99))
    assert got == {"fmt": "avi", "width": 320, "height": 240, "n_frames": 99}


def test_parse_media_header_avi_truncated_returns_none():
    assert parse_media_header(_avi(320, 240, 99)[:20]) is None
    # RIFF/AVI signature but no hdrl LIST at all
    import struct as _s

    assert parse_media_header(b"RIFF" + _s.pack("<I", 4) + b"AVI ") is None


def _make_png(pixels, ctype=2, filters=None):
    """Minimal valid PNG encoder for tests: 8-bit depth, non-interlaced.
    ``filters`` gives the per-row filter byte (default all 0); rows are
    FORWARD-filtered accordingly so the decoder must invert them."""
    import struct as _s
    import zlib as _z

    import numpy as np

    h, w, nch = pixels.shape
    assert nch in (1, 3, 4)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * nch, dtype=np.int16)
    for y, f in zip(range(h), filters):
        line = pixels[y].reshape(-1).astype(np.int16)
        if f == 0:
            enc = line.copy()
        elif f == 2:  # Up: store delta vs previous reconstructed row
            enc = (line - prev) % 256
        else:
            raise NotImplementedError(f)
        raw.append(f)
        raw += bytes(enc.astype(np.uint8))
        prev = line
    def chunk(tag, body):
        return (
            _s.pack(">I", len(body)) + tag + body
            + _s.pack(">I", _z.crc32(tag + body))
        )
    ihdr = _s.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[nch], 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _z.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_pixel_decode_roundtrip_and_filters():
    """decode_png_pixels must reconstruct exact pixel values through
    zlib + filter inversion (None and Up filters), for RGB, grayscale
    and RGBA payloads — no codec import anywhere."""
    import numpy as np

    from distributed_map_reduce_spark.operators.multimodal import (
        decode_png_pixels,
    )

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    assert np.array_equal(decode_png_pixels(_make_png(rgb)), rgb)
    # Up-filtered rows after the first
    filt = [0] + [2] * 4
    assert np.array_equal(
        decode_png_pixels(_make_png(rgb, filters=filt)), rgb
    )
    gray = rng.integers(0, 256, size=(3, 6, 1), dtype=np.uint8)
    assert np.array_equal(
        decode_png_pixels(_make_png(gray)), np.repeat(gray, 3, axis=2)
    )
    rgba = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png_pixels(_make_png(rgba)), rgba[:, :, :3]
    )
    assert decode_png_pixels(b"\x89PNG\r\n\x1a\ngarbage") is None


def test_resize_media_real_png_path(spark):
    """resize_media must take the REAL stdlib path for a PNG payload:
    the reported mean equals the numpy nearest-neighbor reference, not
    the byte-stride stand-in."""
    import numpy as np

    from distributed_map_reduce_spark.operators.multimodal import (
        resize_media,
    )

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(16, 12, 3), dtype=np.uint8)
    payload = _make_png(px)
    df = spark.createDataFrame(
        [(1, payload, {"media_type": "image"})],
        "media_id bigint, payload binary, meta map<string,string>",
    )
    row = resize_media(df, width=6, height=6).collect()[0]
    ys = (np.arange(6) * 16) // 6
    xs = (np.arange(6) * 12) // 6
    ref = px[ys][:, xs]
    assert row["out_bytes"] == ref.nbytes
    assert abs(row["mean_px"] - float(ref.mean())) < 1e-9


def test_png_decode_rejects_truncated_and_oversized_streams():
    """Hardening pins for the bounded-inflate path: a zlib stream with
    its Adler-32 trailer truncated must be rejected (decompressobj
    returns bytes without end-of-stream validation — dec.eof is the
    guard), and an IHDR declaring an absurd pixel budget must be
    rejected BEFORE inflation (the cap must not be attacker-sized)."""
    import struct as _s
    import zlib as _z

    import numpy as np

    from distributed_map_reduce_spark.operators.multimodal import (
        decode_png_pixels,
    )

    rgb = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    good = _make_png(rgb)
    assert decode_png_pixels(good) is not None

    # rebuild with the IDAT zlib trailer (Adler-32) cut off
    def chunk(tag, body):
        return (_s.pack(">I", len(body)) + tag + body
                + _s.pack(">I", _z.crc32(tag + body)))

    raw = bytearray()
    for y in range(5):
        raw.append(0)
        raw += bytes(rgb[y].reshape(-1))
    z = _z.compress(bytes(raw))
    truncated = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 4, 5, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", z[:-4])
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(truncated) is None

    # 65535x65535 RGBA IHDR with a tiny high-ratio body: must return
    # None without attempting a ~17 GB inflation
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 65535, 65535, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 1024))
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(bomb) is None
