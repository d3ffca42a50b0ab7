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
    frame_sample_stub,
    resize_stub,
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
    resized = resize_stub(media, max_dim=100)
    meta = {r["media_id"]: r for r in extract_metadata(resized).collect()}
    assert meta[0]["width"] == 100 and meta[0]["height"] == 75
    assert meta[1]["width"] == 64  # already under the cap
    assert meta[2]["valid"] == "corrupt"  # corrupt passes through untouched


def test_frame_sample(media):
    frames = frame_sample_stub(media, every_n_bytes=64).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[0]) == 4  # 256-byte body / 64
    assert all(r["frame_byte"] is not None for r in by_id[0])
    assert 3 not in by_id  # null payload emits nothing


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"anything")


def test_feature_extract_composes_with_similarity(media):
    from djangoadmin_postgresql_2_elasticseach_spark.operators.multimodal import (
        feature_extract_stub,
    )
    from djangoadmin_postgresql_2_elasticseach_spark.operators.similarity import (
        brute_force_topk,
    )

    emb = feature_extract_stub(media, dim=8)
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
