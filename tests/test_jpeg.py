"""Baseline JPEG codec (functions/jpeg.py): exact constant-block
round-trip, full entropy path via a test-only general encoder (AC
coefficients, zigzag, ZRL/EOB, multi-component MCUs, restart markers),
and honest error paths."""

import struct

import numpy as np
import pytest

from reactivedb_spark.functions.jpeg import (
    ZIGZAG,
    _idct_matrix,
    jpeg_decode_bytes,
    jpeg_encode_bytes,
)


def test_constant_block_roundtrip_exact():
    for text in (b"", b"A", b"the quick brown fox " * 40, bytes(range(256))):
        p = jpeg_encode_bytes(text, 16)
        info = jpeg_decode_bytes(p)
        n = max(len(text), 1)
        assert info["width"] == 128
        assert info["height"] == 8 * ((n + 15) // 16)
        assert info["n_components"] == 1
        assert sum(info["pixels"]) == 64 * sum(text)


def test_rejects_non_jpeg():
    with pytest.raises(ValueError):
        jpeg_decode_bytes(b"\x89PNG\r\n\x1a\nnope")


def test_progressive_raises_not_implemented():
    # SOI + minimal SOF2 segment
    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    with pytest.raises(NotImplementedError):
        jpeg_decode_bytes(b"\xff\xd8" + sof2 + b"\xff\xd9")


def test_fill_bytes_before_marker_tolerated():
    # ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
    # marker code — decode must skip them, not parse a bogus segment
    text = b"the quick brown fox " * 10
    p = jpeg_encode_bytes(text, 16)
    padded = p[:2] + b"\xff\xff\xff" + p[2:]
    assert jpeg_decode_bytes(padded) == jpeg_decode_bytes(p)


def test_multi_scan_baseline_raises_not_implemented():
    # SOS naming fewer components than the SOF frame = non-interleaved
    # multi-scan baseline; decoding only the first scan with scan-derived
    # MCU geometry would silently mis-decode, so it must refuse
    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    sos = seg(0xDA, bytes([1]) + bytes([1, 0x00]) + bytes([0, 63, 0]))
    with pytest.raises(NotImplementedError):
        jpeg_decode_bytes(b"\xff\xd8" + seg(0xDB, bytes([0]) + bytes([1] * 64)) + sof + sos + b"\xff\xd9")


# -- test-only general encoder: real DCT, rich Huffman, optional restarts ----

_DC_VALS = bytes(range(12))
_AC_VALS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)  # EOB, ZRL, then every (run, size) with size 1..10


def _dht_body(tc_th: int, vals: bytes) -> bytes:
    bits = [0] * 16
    bits[7] = len(vals)  # every symbol at length 8 → code == index
    return bytes([tc_th]) + bytes(bits) + vals


class _W:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def put(self, v, n):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def _encode_general(planes, restart_interval=0, sampling=None):
    """Multi-component baseline encoder over integer-rounded DCT
    coefficients; returns (payload, expected_planes) where expected is
    the exact IDCT of the coefficients actually transmitted.
    ``sampling`` is [(h, v)] per component (default 4:4:4); each plane
    must be pre-sized to its own sampled resolution."""
    m = _idct_matrix()
    nc = len(planes)
    sampling = sampling or [(1, 1)] * nc
    hmax = max(h for h, _ in sampling)
    vmax = max(v for _, v in sampling)
    frame_h, frame_w = planes[0].shape[0] * vmax // sampling[0][1], \
        planes[0].shape[1] * hmax // sampling[0][0]
    mcux, mcuy = frame_w // (8 * hmax), frame_h // (8 * vmax)

    wr = _W()
    pred = [0] * nc
    expected = [np.zeros_like(p, dtype=np.int16) for p in planes]

    def put_block(ci, plane, by, bx):
        blk = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float) - 128.0
        coeffs = np.rint(m @ blk @ m.T).astype(int)
        recon = np.clip(np.rint(m.T @ coeffs @ m + 128.0), 0, 255)
        expected[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = recon
        zz = [int(coeffs[ZIGZAG[i] >> 3, ZIGZAG[i] & 7]) for i in range(64)]
        diff = zz[0] - pred[ci]
        pred[ci] = zz[0]
        s = abs(diff).bit_length()
        wr.put(s, 8)
        if s:
            wr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        k, run = 1, 0
        while k < 64:
            v = zz[k]
            if v == 0:
                run += 1
            else:
                while run >= 16:
                    wr.put(_AC_VALS.index(0xF0), 8)
                    run -= 16
                s = abs(v).bit_length()
                wr.put(_AC_VALS.index((run << 4) | s), 8)
                wr.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            k += 1
        if run:
            wr.put(_AC_VALS.index(0x00), 8)  # EOB

    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wr.align()
                wr.out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                pred = [0] * nc
            mcu += 1
            for ci, plane in enumerate(planes):
                ch, cv = sampling[ci]
                for by in range(cv):
                    for bx in range(ch):
                        put_block(ci, plane, my * cv + by, mx * ch + bx)
    wr.align()

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    comps_sof = b"".join(
        bytes([i + 1, (sampling[i][0] << 4) | sampling[i][1], 0]) for i in range(nc)
    )
    comps_sos = b"".join(bytes([i + 1, 0x00]) for i in range(nc))
    payload = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + seg(0xC0, struct.pack(">BHHB", 8, frame_h, frame_w, nc) + comps_sof)
        + seg(0xC4, _dht_body(0x00, _DC_VALS) + _dht_body(0x10, _AC_VALS))
        + (seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b"")
        + seg(0xDA, bytes([nc]) + comps_sos + bytes([0, 63, 0]))
        + bytes(wr.out)
        + b"\xff\xd9"
    )
    return payload, expected


def _gradient(h, w, seed):
    rng = np.random.default_rng(seed)
    base = np.add.outer(np.arange(h) * 3, np.arange(w) * 5) % 256
    return ((base + rng.integers(0, 8, (h, w))) % 256).astype(np.uint8)


def test_general_decode_matches_transmitted_coefficients_exactly():
    img = _gradient(24, 32, 1)
    payload, expected = _encode_general([img])
    info = jpeg_decode_bytes(payload)
    assert (info["width"], info["height"]) == (32, 24)
    got = np.frombuffer(info["pixels"], dtype=np.uint8).reshape(24, 32)
    assert np.array_equal(got, expected[0].astype(np.uint8))
    # and the transmitted-coefficient image is within DCT-quantization
    # distance of the source (sanity that the path is a real codec)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 4


def test_three_component_interleave_and_luma_extraction():
    y = _gradient(16, 16, 2)
    cb = _gradient(16, 16, 3)
    cr = _gradient(16, 16, 4)
    payload, expected = _encode_general([y, cb, cr])
    info = jpeg_decode_bytes(payload)
    assert info["n_components"] == 3
    got = np.frombuffer(info["pixels"], dtype=np.uint8).reshape(16, 16)
    assert np.array_equal(got, expected[0].astype(np.uint8))


def test_420_chroma_subsampling_decodes_full_res_luma():
    """The common real-world layout: Y at 2x2 per MCU, chroma at 1x1
    (4:2:0). The decoder must interleave 4 Y + 1 Cb + 1 Cr blocks per
    MCU and return the full-resolution luma plane."""
    y = _gradient(16, 32, 6)
    cb = _gradient(8, 16, 7)
    cr = _gradient(8, 16, 8)
    payload, expected = _encode_general(
        [y, cb, cr], sampling=[(2, 2), (1, 1), (1, 1)]
    )
    info = jpeg_decode_bytes(payload)
    assert (info["width"], info["height"], info["n_components"]) == (32, 16, 3)
    got = np.frombuffer(info["pixels"], dtype=np.uint8).reshape(16, 32)
    assert np.array_equal(got, expected[0].astype(np.uint8))


def test_restart_markers_reset_predictors():
    img = _gradient(16, 48, 5)
    payload, expected = _encode_general([img], restart_interval=2)
    info = jpeg_decode_bytes(payload)
    got = np.frombuffer(info["pixels"], dtype=np.uint8).reshape(16, 48)
    assert np.array_equal(got, expected[0].astype(np.uint8))


def test_dataframe_wrappers_roundtrip(spark):
    from reactivedb_spark.functions import multimodal

    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, "x" * 300)], "doc_id: long, text: string"
    )
    out = {
        r["doc_id"]: r
        for r in multimodal.decode_jpeg(
            multimodal.encode_jpeg(df, "doc_id", "text"), "doc_id"
        ).collect()
    }
    assert out[1]["pix_sum"] == 64 * sum(b"hello")
    assert out[2]["pix_sum"] == 0
    assert out[3]["height"] == 8 * ((300 + 15) // 16)


def test_decode_bytes_dispatches_jpeg(spark):
    from reactivedb_spark.functions.multimodal import decode_bytes

    meta = decode_bytes(jpeg_encode_bytes(b"abc", 16))
    assert meta["format"] == "jpeg" and meta["width"] == 128


def test_gray_plane_dispatch_gives_jpeg_real_pixels():
    from reactivedb_spark.functions.multimodal import _gray_plane

    text = b"feature extraction pixels"  # 25 bytes → 2 block rows
    px, w, h = _gray_plane(jpeg_encode_bytes(text, 16))
    assert (w, h) == (128, 16)
    assert sum(px) == 64 * sum(text)


def test_decode_bytes_falls_back_on_undecodable_jpeg_magic():
    """JPEG magic but not baseline-decodable (e.g. progressive) must
    fall back to the deterministic stub in decode_metadata's path, not
    crash the task."""
    from reactivedb_spark.functions.multimodal import decode_bytes, fake_decode_bytes

    sof2 = b"\xff\xc2" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    payload = b"\xff\xd8" + sof2 + b"\xff\xd9"
    assert decode_bytes(payload) == fake_decode_bytes(payload)
