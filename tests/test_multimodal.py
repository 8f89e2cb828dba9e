"""Multimodal plumbing: decode / resize / feature-extract / frame-sample
over binary payloads (stubs behind real Arrow mapInPandas shapes)."""

from reactivedb_spark.functions import multimodal
from reactivedb_spark.sources import read_fixture

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return multimodal.with_payload(read_fixture(spark, SF, "documents").limit(20), "text")


def test_decode_metadata(spark):
    out = multimodal.decode_metadata(_docs(spark), "doc_id").collect()
    assert len(out) == 20
    r = out[0]
    assert 64 <= r["width"] < 576 and r["format"] in ("png", "jpeg", "webp")
    assert r["n_bytes"] > 0


def test_resize_bounds_payload(spark):
    out = multimodal.resize(_docs(spark), "doc_id", target=8).collect()
    assert all(0 < len(r["payload"]) <= 64 for r in out)


def test_extract_features_deterministic(spark):
    a = {r["doc_id"]: r["features"] for r in
         multimodal.extract_features(_docs(spark), "doc_id").collect()}
    b = {r["doc_id"]: r["features"] for r in
         multimodal.extract_features(_docs(spark), "doc_id").collect()}
    assert a == b
    assert all(len(v) == 8 and all(0.0 <= x <= 1.0 for x in v) for v in a.values())


def test_sample_frames_one_to_many(spark):
    frames = multimodal.sample_frames(_docs(spark), "doc_id", every_n=50).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(
        sorted(x["frame_no"] for x in rows) == list(range(len(rows)))
        for rows in by_doc.values()
    )
    assert sum(len(r["frame"]) for r in frames) == sum(
        r["n_bytes"] for r in multimodal.decode_metadata(_docs(spark), "doc_id").collect()
    )


class TestRealPngCodec:
    def test_roundtrip_real_bytes(self):
        from reactivedb_spark.functions import multimodal as mm

        data = bytes(range(256)) * 3 + b"tail"
        png = mm.png_encode_bytes(data, width=20)
        assert png[:8] == mm.PNG_MAGIC
        info = mm.png_decode_bytes(png)
        assert info["width"] == 20
        assert info["height"] == (len(data) + 19) // 20
        assert info["bit_depth"] == 8 and info["color_type"] == 0
        # decoded pixels = original bytes + zero padding
        assert info["pixels"][: len(data)] == data
        assert set(info["pixels"][len(data):]) <= {0}

    def test_empty_payload_still_valid_png(self):
        from reactivedb_spark.functions import multimodal as mm

        info = mm.png_decode_bytes(mm.png_encode_bytes(b"", width=16))
        assert (info["width"], info["height"]) == (16, 1)
        assert info["pixels"] == b"\x00" * 16

    def test_defilter_all_filter_types(self):
        """Hand-build a 5-row image using filter types 0..4 and check the
        decoder reconstructs the reference pixels (computed by applying
        the spec's forward filters to a known image)."""
        import struct
        import zlib

        from reactivedb_spark.functions import multimodal as mm

        w, h = 7, 5
        pixels = bytes((r * 37 + c * 11) % 256 for r in range(h) for c in range(w))
        rows = [pixels[r * w:(r + 1) * w] for r in range(h)]
        # forward-filter each row with its filter type (spec §9)
        raw = bytearray()
        prev = bytes(w)
        for ft, row in enumerate(rows):
            raw.append(ft)
            for i in range(w):
                x = row[i]
                a = row[i - 1] if i else 0
                b = prev[i]
                c = prev[i - 1] if i else 0
                if ft == 1:
                    x = (x - a) & 0xFF
                elif ft == 2:
                    x = (x - b) & 0xFF
                elif ft == 3:
                    x = (x - ((a + b) >> 1)) & 0xFF
                elif ft == 4:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    x = (x - pr) & 0xFF
                raw.append(x)
            prev = row

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        png = (mm.PNG_MAGIC
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
        assert mm.png_decode_bytes(png)["pixels"] == pixels

    def test_crc_corruption_detected(self):
        import pytest

        from reactivedb_spark.functions import multimodal as mm

        png = bytearray(mm.png_encode_bytes(b"hello world", width=4))
        png[40] ^= 0xFF  # flip a byte inside a chunk body
        with pytest.raises(ValueError, match="CRC"):
            mm.png_decode_bytes(bytes(png))

    def test_decode_metadata_dispatches_real_png(self, spark):
        from pyspark.sql import functions as F

        from reactivedb_spark.functions import multimodal as mm

        df = spark.createDataFrame([(1, "some pixel text"), (2, "x" * 40)],
                                   "doc_id long, text string")
        png_df = mm.encode_png(df, "doc_id", "text", width=8)
        out = {r.doc_id: r for r in
               mm.decode_metadata(png_df, "doc_id").collect()}
        assert out[1].format == "png" and out[1].width == 8
        assert out[2].height == 5  # ceil(40/8)
        # non-PNG payloads still take the labeled stub path
        stub = mm.decode_metadata(
            df.withColumn("payload", F.encode("text", "UTF-8")), "doc_id"
        ).collect()
        assert all(r.format in ("png", "jpeg", "webp") for r in stub)


def test_wav_roundtrip_pure_python():
    from reactivedb_spark.functions.multimodal import wav_decode_bytes, wav_encode_bytes

    payload = wav_encode_bytes(b"hello", sample_rate=44100)
    info = wav_decode_bytes(payload)
    assert info["n_channels"] == 1
    assert info["sample_rate"] == 44100
    assert info["bits"] == 16
    assert info["n_samples"] == 5
    assert info["amp_sum"] == sum(abs(b - 128) * 256 for b in b"hello")


def test_wav_decoder_rejects_garbage():
    import pytest as _pytest

    from reactivedb_spark.functions.multimodal import wav_decode_bytes

    with _pytest.raises(ValueError):
        wav_decode_bytes(b"not a wav at all")


def test_wav_decoder_word_alignment():
    """Odd-length chunks are padded to word boundaries; the walker must
    skip the pad byte or it misreads every subsequent tag."""
    import struct

    from reactivedb_spark.functions.multimodal import wav_decode_bytes, wav_encode_bytes

    base = wav_encode_bytes(b"ab")
    # inject an odd-length junk chunk between WAVE and fmt
    junk = b"junk" + struct.pack("<I", 3) + b"xyz" + b"\x00"
    payload = base[:12] + junk + base[12:]
    info = wav_decode_bytes(payload)
    assert info["n_samples"] == 2


def test_pixel_features_use_decoded_pixels(spark):
    """PNG payloads: features come from the DECODED pixel plane (with the
    encoder's zero row-padding), not the encoded bytes."""
    from reactivedb_spark.functions import multimodal as mm

    text = "abcdefghij"  # 10 bytes → width 16, height 1, 6 zero-pad pixels
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    pay = mm.encode_png(df, "doc_id", "text", width=16)
    got = mm.extract_features(pay, "doc_id").collect()[0]["features"]
    pixels = text.encode().ljust(16, b"\x00")
    want = []
    for j in range(8):
        sel = [pixels[i] for i in range(16) if i % 8 == j]
        want.append(float(sum(sel) / len(sel) / 255.0))
    import numpy as np

    assert np.allclose(got, np.array(want, dtype="float32"), rtol=0, atol=0)


def test_resize_png_real_grid_downsample(spark):
    """PNG resize: nearest-neighbor over the decoded pixel GRID, output a
    valid PNG with the target geometry."""
    from reactivedb_spark.functions import multimodal as mm

    # 4x4 image with distinct values 0..15
    px = bytes(range(16))
    payload = mm.png_encode_bytes(px, 4)
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    out = bytes(mm.resize(df, "doc_id", target=2).collect()[0]["payload"])
    info = mm.png_decode_bytes(out)
    assert (info["width"], info["height"]) == (2, 2)
    # nearest-neighbor picks (0,0),(0,2),(2,0),(2,2) → values 0,2,8,10
    assert list(info["pixels"]) == [0, 2, 8, 10]


def test_resize_non_png_falls_back_to_byte_subsample(spark):
    from reactivedb_spark.functions import multimodal as mm

    df = spark.createDataFrame([(1, bytes(range(256)) * 64)], "doc_id long, payload binary")
    out = bytes(mm.resize(df, "doc_id", target=8).collect()[0]["payload"])
    assert len(out) <= 64 and out[0] == 0


def _rgb_png(pixels_rgb, width):
    """Minimal RGB (color type 2) PNG builder for tests: filter 0 rows."""
    import struct
    import zlib

    from reactivedb_spark.functions.multimodal import PNG_MAGIC

    stride = width * 3
    height = len(pixels_rgb) // stride
    raw = b"".join(
        b"\x00" + pixels_rgb[r * stride:(r + 1) * stride] for r in range(height)
    )

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_rgb_png_gray_reduction_in_features_and_resize(spark):
    """Color-type-2 payloads go through the channel-mean gray reduction
    before features/resize — not the raw interleaved samples."""
    from reactivedb_spark.functions import multimodal as mm

    # 2x2 RGB: pixels (10,20,30) (60,70,80) / (110,120,130) (200,210,220)
    rgb = bytes([10, 20, 30, 60, 70, 80, 110, 120, 130, 200, 210, 220])
    payload = _rgb_png(rgb, 2)
    gray = [20, 70, 120, 210]  # integer channel means

    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    feats = mm.extract_features(df, "doc_id", dim=4).collect()[0]["features"]
    import numpy as np

    want = np.array([g / 255.0 for g in gray], dtype="float32")
    assert np.allclose(feats, want, rtol=0, atol=0)

    out = bytes(mm.resize(df, "doc_id", target=1).collect()[0]["payload"])
    info = mm.png_decode_bytes(out)
    assert (info["width"], info["height"], info["color_type"]) == (1, 1, 0)
    assert list(info["pixels"]) == [20]  # NN pick = top-left gray pixel


def test_wav_frame_features_windows_and_crossings(spark):
    """Frame arithmetic + level-crossing contract: 600 samples at
    frame=256 → frames of 256/256/88; crossings count in-frame pairs
    straddling byte 96 only (boundary pairs between frames excluded)."""
    from pyspark.sql import functions as F

    from reactivedb_spark.functions import multimodal

    # alternating 'a' (97, above level) / 'A' (65, below level): every
    # consecutive pair crosses → frame of n samples has n-1 crossings
    text = ("aA" * 300)[:600]
    df = spark.createDataFrame([(1, text), (2, "")], "doc_id long, text string")
    pay = multimodal.encode_wav(df, "doc_id", "text")
    out = multimodal.wav_frame_features(pay, "doc_id", frame=256)
    rows = {(r["doc_id"], r["frame_idx"]): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 1), (1, 2)}  # empty doc: no frames
    assert [rows[(1, i)]["n_samples"] for i in range(3)] == [256, 256, 88]
    assert [rows[(1, i)]["crossings"] for i in range(3)] == [255, 255, 87]
    # amp_sum: |(97-128)*256| = 7936, |(65-128)*256| = 16128, alternating
    assert rows[(1, 0)]["amp_sum"] == 128 * (7936 + 16128)
    assert rows[(1, 2)]["amp_sum"] == 44 * (7936 + 16128)
