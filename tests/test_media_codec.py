"""Real-codec unit tests (no Spark): stdlib PNG/PPM/PGM/BMP/WAV decode
and encode on actual bytes, including PNG scanline filters 1-4, BMP
row padding, and netpbm comment headers. These run with zero
third-party imports — the Pillow tier only widens format coverage."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from djangoadmin_postgresql_2_elasticseach_spark.operators import media_codec as C


def _rng(seed=7):
    return np.random.default_rng(seed)


def tiny_jpeg_header(w: int, h: int, ch: int = 3) -> bytes:
    """Minimal JPEG prefix: SOI + APP0 + SOF0 (enough for jpeg_meta;
    not a decodable image)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + b"\x00" * 6
    sof_payload = struct.pack(">BHHB", 8, h, w, ch) + b"\x01\x11\x00" * ch
    sof = b"\xff\xc0" + struct.pack(">H", 2 + len(sof_payload)) + sof_payload
    return b"\xff\xd8" + app0 + sof


# ---------------------------------------------------------------------------
# sniffing
# ---------------------------------------------------------------------------


def test_sniff():
    assert C.sniff(C.encode_png(np.zeros((2, 2), np.uint8))) == "png"
    assert C.sniff(C.encode_pnm(np.zeros((2, 2, 3), np.uint8))) == "ppm"
    assert C.sniff(C.encode_pnm(np.zeros((2, 2, 1), np.uint8))) == "pgm"
    assert C.sniff(C.encode_bmp(np.zeros((2, 2, 3), np.uint8))) == "bmp"
    assert C.sniff(C.encode_wav(np.zeros(8, np.int16))) == "wav"
    assert C.sniff(tiny_jpeg_header(4, 4)) == "jpeg"
    assert C.sniff(b"garbage!") == "unknown"
    assert C.sniff(None) == "unknown"
    assert C.sniff(b"") == "unknown"


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_round_trip(ch):
    arr = _rng(ch).integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    out = C.decode_png(C.encode_png(arr))
    assert out.shape == (13, 9, ch)
    assert np.array_equal(out, arr)


def _png_filter_forward(arr: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG filters row-by-row (the encoder side of the filters the
    decoder must undo) and assemble a full PNG stream."""
    h, w, ch = arr.shape
    stride = w * ch
    flat = arr.reshape(h, stride).astype(np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    body = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        cur = flat[y]
        enc = np.empty(stride, dtype=np.int16)
        for x in range(stride):
            left = cur[x - ch] if x >= ch else 0
            up = prev[x]
            ul = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = left
            elif f == 2:
                pred = up
            elif f == 3:
                pred = (left + up) >> 1
            else:
                pred = C._paeth(int(left), int(up), int(ul))
            enc[x] = (cur[x] - pred) & 0xFF
        body.append(f)
        body.extend(enc.astype(np.uint8).tobytes())
        prev = cur
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        C._PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + C._png_chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_unfilters_all_filter_types(ftypes):
    arr = _rng(42).integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    payload = _png_filter_forward(arr, ftypes)
    assert np.array_equal(C.decode_png(payload), arr)


def test_png_meta_no_decode():
    arr = _rng(1).integers(0, 256, size=(5, 8, 3), dtype=np.uint8)
    assert C.png_meta(C.encode_png(arr)) == (8, 5, 3)
    assert C.image_meta(C.encode_png(arr)) == (8, 5, 3, "png")


# ---------------------------------------------------------------------------
# netpbm / BMP
# ---------------------------------------------------------------------------


def test_pnm_round_trip_and_comments():
    arr = _rng(2).integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
    assert np.array_equal(C.decode_pnm(C.encode_pnm(arr)), arr)
    gray = arr[:, :, :1]
    assert np.array_equal(C.decode_pnm(C.encode_pnm(gray)), gray)
    # hand-built header with a comment line (netpbm allows them)
    body = arr.tobytes()
    payload = b"P6\n# a comment\n10 6\n255\n" + body
    assert np.array_equal(C.decode_pnm(payload), arr)
    assert C.image_meta(payload)[:2] == (10, 6)


def test_bmp_round_trip_with_padding():
    # width 3 → 9-byte rows padded to 12: exercises stride handling
    arr = _rng(3).integers(0, 256, size=(4, 3, 3), dtype=np.uint8)
    payload = C.encode_bmp(arr)
    assert np.array_equal(C.decode_bmp(payload), arr)
    assert C.bmp_meta(payload) == (3, 4, 3)


# ---------------------------------------------------------------------------
# JPEG header / WAV
# ---------------------------------------------------------------------------


def test_jpeg_meta():
    assert C.jpeg_meta(tiny_jpeg_header(640, 480)) == (640, 480, 3)
    assert C.image_meta(tiny_jpeg_header(32, 16, 1)) == (32, 16, 1, "jpeg")


def test_wav_round_trip():
    samples = (_rng(4).integers(-(2**15), 2**15, size=(100, 2))).astype(np.int16)
    payload = C.encode_wav(samples, sample_rate=8000)
    ch, rate, n, dur = C.wav_meta(payload)
    assert (ch, rate, n) == (2, 8000, 100)
    assert abs(dur - 100 / 8000) < 1e-9
    assert np.array_equal(C.decode_wav(payload), samples)


# ---------------------------------------------------------------------------
# unified entry points / resize
# ---------------------------------------------------------------------------


def test_decode_image_dispatch():
    arr = _rng(5).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    for fmt in ("png", "ppm", "bmp"):
        assert np.array_equal(C.decode_image(C.encode_image(arr, fmt)), arr)
    if not C.HAVE_PIL:
        with pytest.raises(C.CodecUnavailable):
            C.decode_image(tiny_jpeg_header(4, 4))


def test_resize_nn():
    arr = _rng(6).integers(0, 256, size=(40, 30, 3), dtype=np.uint8)
    small = C.resize_nn(arr, 10)
    assert small.shape[0] == 10 and small.shape[1] <= 10
    assert C.resize_nn(arr, 64) is arr  # under cap → no-op, same object
    # nearest-neighbor: every output pixel exists in the input
    assert small.dtype == np.uint8


def test_gif_meta_header_only():
    from djangoadmin_postgresql_2_elasticseach_spark.operators import media_codec as C

    # minimal GIF89a logical screen descriptor: 7x11, then terminator
    payload = b"GIF89a" + (7).to_bytes(2, "little") + (11).to_bytes(2, "little") \
        + b"\x00\x00\x00;"
    assert C.sniff(payload) == "gif"
    assert C.image_meta(payload) == (7, 11, 3, "gif")
    # pixel decode without Pillow stays a loud CodecUnavailable
    if not C.HAVE_PIL:
        import pytest

        with pytest.raises(NotImplementedError):
            C.decode_image(payload)
