"""Multimodal-column plumbing tests: binary payloads through Arrow-batched
mapInPandas — schema contract, corrupt/null handling, composability."""

from __future__ import annotations

import pytest

from djangoadmin_postgresql_2_elasticseach_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_real,
    encode_fake_image,
    extract_metadata,
    filter_by_metadata,
    frame_sample_bytes,
    resize_real,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", encode_fake_image(0, 640, 480)),
        (1, "image", encode_fake_image(1, 64, 64, 1)),
        (2, "image", b"not a real payload"),
        (3, "image", None),
        (4, "video", encode_fake_image(4, 1920, 1080)),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(2)


def test_extract_metadata(media):
    meta = {r["media_id"]: r for r in extract_metadata(media).collect()}
    assert meta[0]["width"] == 640 and meta[0]["height"] == 480
    assert meta[1]["channels"] == 1
    assert meta[2]["valid"] == "corrupt" and meta[2]["width"] is None
    assert meta[3]["valid"] == "null" and meta[3]["n_bytes"] is None
    assert meta[4]["width"] == 1920


def test_filter_by_metadata(media):
    wide = filter_by_metadata(extract_metadata(media), min_width=600)
    assert {r["media_id"] for r in wide.collect()} == {0, 4}


def test_resize_then_extract_composes(media):
    # resize_real's FAKEIMG branch is the header-clamp path the old
    # resize_stub shipped separately (folded in r10 — one resize export)
    resized = resize_real(media, max_dim=100)
    meta = {r["media_id"]: r for r in extract_metadata(resized).collect()}
    assert meta[0]["width"] == 100 and meta[0]["height"] == 75
    assert meta[1]["width"] == 64  # already under the cap
    assert meta[2]["valid"] == "corrupt"  # corrupt passes through untouched


def test_frame_sample(media):
    frames = frame_sample_bytes(media, every_n_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[0]) == 4  # 256-byte body / 64
    assert all(r["frame_byte"] is not None for r in by_id[0])
    assert 3 not in by_id  # null payload emits nothing


def test_real_decode_rejects_non_media():
    with pytest.raises(ValueError):
        decode_real(b"anything")  # unidentifiable bytes
    with pytest.raises(ValueError):
        decode_real(encode_fake_image(0, 4, 4))  # synthetic header is not an image


def test_jpeg_pixel_decode_needs_pillow():
    """JPEG entropy decode is Pillow-tier: without PIL it must raise
    CodecUnavailable (metadata parsing still works — see
    test_media_codec.py); with PIL this case is covered by Pillow."""
    from djangoadmin_postgresql_2_elasticseach_spark.operators.media_codec import (
        HAVE_PIL,
        CodecUnavailable,
    )
    from tests.test_media_codec import tiny_jpeg_header

    if HAVE_PIL:
        pytest.skip("Pillow present — decode goes through PIL")
    with pytest.raises(CodecUnavailable):
        decode_real(tiny_jpeg_header(8, 6))


def test_feature_extract_composes_with_similarity(media):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.multimodal import (
        feature_extract_histogram,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = feature_extract_histogram(media, dim=8)
    rows = {r["media_id"]: r["embedding"] for r in emb.collect()}
    # valid payloads embed to a dim-8 unit-sum histogram; nulls stay null
    assert rows[3] is None
    vec = rows[0]
    assert len(vec) == 8 and abs(sum(vec) - 1.0) < 1e-6
    # determinism: same payload -> identical embedding
    assert rows[0] == {r["media_id"]: r["embedding"] for r in emb.collect()}[0]
    # composes with the ANN operator (media_id as vec_id)
    valid = emb.filter("embedding is not null").withColumnRenamed(
        "media_id", "vec_id"
    )
    top = brute_force_topk(valid, [float(x) for x in vec], k=2).collect()
    assert top[0]["vec_id"] == 0 and top[0]["cos_sim"] == 1.0


@pytest.fixture(scope="module")
def real_media(spark):
    """Actual image/audio bytes (stdlib-encoded PNG/PPM/BMP/WAV + a JPEG
    header + the synthetic FAKEIMG + garbage) through the same plumbing."""
    import numpy as np

    from djangoadmin_postgresql_2_elasticseach_spark.operators import media_codec as C
    from tests.test_media_codec import tiny_jpeg_header

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(48, 32, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(20, 60, 1), dtype=np.uint8)
    wav = rng.integers(-(2**15), 2**15, size=(400, 1)).astype(np.int16)
    rows = [
        (10, "image", C.encode_png(img)),
        (11, "image", C.encode_pnm(img)),
        (12, "image", C.encode_bmp(img)),
        (13, "image", C.encode_pnm(gray)),
        (14, "image", tiny_jpeg_header(640, 480)),
        (15, "audio", C.encode_wav(wav, sample_rate=8000)),
        (16, "image", encode_fake_image(16, 200, 100)),
        (17, "image", b"\x00\x01garbage"),
        (18, "image", None),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(2)


def test_extract_metadata_real_formats(real_media):
    meta = {r["media_id"]: r for r in extract_metadata(real_media).collect()}
    assert (meta[10]["width"], meta[10]["height"], meta[10]["channels"],
            meta[10]["format"]) == (32, 48, 3, "png")
    assert (meta[11]["width"], meta[11]["format"]) == (32, "ppm")
    assert (meta[12]["width"], meta[12]["height"], meta[12]["format"]) == (32, 48, "bmp")
    assert (meta[13]["width"], meta[13]["height"], meta[13]["channels"],
            meta[13]["format"]) == (60, 20, 1, "pgm")
    # JPEG: dims from the SOF header, no pixel decode needed
    assert (meta[14]["width"], meta[14]["height"], meta[14]["format"]) == (640, 480, "jpeg")
    # WAV: width carries n_frames, channels the channel count
    assert (meta[15]["width"], meta[15]["channels"], meta[15]["format"]) == (400, 1, "wav")
    assert meta[16]["format"] == "fake" and meta[16]["width"] == 200
    assert meta[17]["valid"] == "corrupt"
    assert meta[18]["valid"] == "null"


def test_resize_real_decodes_and_reencodes(real_media):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.multimodal import (
        resize_real,
    )

    resized = resize_real(real_media, max_dim=16)
    meta = {r["media_id"]: r for r in extract_metadata(resized).collect()}
    # decodable images really shrank, same container format
    for mid, fmt in ((10, "png"), (11, "ppm"), (12, "bmp"), (13, "pgm")):
        assert meta[mid]["format"] == fmt
        assert max(meta[mid]["width"], meta[mid]["height"]) <= 16, mid
    # aspect ratio preserved (48x32 -> 16x10)
    assert (meta[10]["height"], meta[10]["width"]) == (16, 10)
    # fake header clamped; undecodable payloads untouched
    assert (meta[16]["width"], meta[16]["height"]) == (16, 8)
    assert meta[14]["width"] == 640  # jpeg passes through without Pillow
    assert meta[17]["valid"] == "corrupt"
    # pixel content is a true nearest-neighbor sample of the original
    import numpy as np

    from djangoadmin_postgresql_2_elasticseach_spark.operators import media_codec as C

    orig = {r["media_id"]: r["payload"] for r in real_media.collect()}
    small = {r["media_id"]: r["payload"] for r in resized.collect()}
    want = C.resize_nn(C.decode_png(orig[10]), 16)
    assert np.array_equal(C.decode_png(small[10]), want)


def test_feature_extract_real_pixels(real_media):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.multimodal import (
        feature_extract_real,
    )

    emb = {
        r["media_id"]: r["embedding"]
        for r in feature_extract_real(real_media, dim=8).collect()
    }
    # png/ppm/bmp of the SAME pixels embed identically (decode-level, not byte-level)
    assert emb[10] == emb[11] == emb[12]
    assert len(emb[10]) == 8 and abs(sum(emb[10]) - 1.0) < 1e-6
    assert emb[15] is not None  # wav embeds from samples
    assert emb[17] is None and emb[18] is None  # garbage/null -> null
    from djangoadmin_postgresql_2_elasticseach_spark.operators.media_codec import (
        HAVE_PIL,
    )

    if not HAVE_PIL:
        assert emb[14] is None  # jpeg pixels need Pillow
