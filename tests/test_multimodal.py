"""Unit tests for multimodal column plumbing: schema, Arrow-batched
decode, stub gating, frame sampling geometry."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from dask_obj_spark.operators.multimodal import (
    as_multimodal,
    decode_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def mm(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, "x" * 40), (2, "0123456789abcdef" * 5)],
        ["doc_id", "text"],
    )
    return as_multimodal(df, "doc_id", "text")


def test_schema_and_meta(mm):
    assert dict(mm.dtypes)["payload"] == "binary"
    rows = {r.doc_id: r.meta for r in mm.collect()}
    assert rows[0].kind == "image" and rows[0].mime == "image/png"
    assert rows[1].kind == "audio" and rows[2].kind == "video"
    assert rows[0].n_bytes == len("alpha beta")


def test_decode_fake_checksum(mm):
    got = {r.doc_id: r for r in decode_media(mm).collect()}
    payload = b"alpha beta"
    assert got[0].n_bytes == len(payload)
    assert got[0].n_space == 1
    assert got[0].checksum == sum(payload) % (2**31)


def test_decode_real_backend_is_stubbed(mm):
    with pytest.raises(NotImplementedError):
        decode_media(mm, backend="real")
    with pytest.raises(ValueError):
        decode_media(mm, backend="nope")


def test_decode_null_payload_propagates_null(spark):
    """Pointer-convention rows (payload NULL + ref — module docstring)
    must flow through the fake decoder as NULL features, not crash on
    len(None) (r13 review finding)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "alpha beta"), (1, None)], "doc_id long, text string"
    ).select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit("image").alias("kind"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )
    got = {r.doc_id: r for r in decode_media(df).collect()}
    assert got[0].n_bytes == 10 and got[0].n_space == 1
    assert got[1].n_bytes is None
    assert got[1].n_space is None and got[1].checksum is None


def test_frame_sample_geometry(mm):
    # doc 2 (video): 80 bytes → frames 0..4; every 4th → idx 0 and 4
    got = sorted(
        (r.frame_idx, r.frame_md5)
        for r in sample_frames(mm, 16, 4).filter(F.col("doc_id") == 2).collect()
    )
    text = "0123456789abcdef" * 5
    exp = [
        (i, hashlib.md5(text[i * 16 : (i + 1) * 16].encode()).hexdigest())
        for i in (0, 4)
    ]
    assert got == exp


def test_frame_sample_empty_payload(spark):
    # doc_id 5 % 3 == 2 → video kind, but the payload is empty: no frames
    # (regression: sequence(0, -1) used to emit a spurious frame-0 row)
    df = spark.createDataFrame([(5, "")], ["doc_id", "text"])
    assert sample_frames(as_multimodal(df, "doc_id", "text"), 16, 4).count() == 0


def test_resize_null_payload_propagates_null(spark):
    """Pointer-convention rows must flow through the resize stub as
    NULL dims, not crash on len(None) — the r13 decode_media finding
    applied to the function next door (r14 review)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(0, "x" * 50), (3, None)], "doc_id long, text string"
    ).select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image/png").alias("mime"),
            F.lit("image").alias("kind"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )
    got = {r.doc_id: r for r in resize_images(df, 64, 64).collect()}
    assert got[0].width == 50 + 16 and got[0].height == 50 + 16
    assert got[0].resized_width == 64 and got[0].resized_height == 64
    assert got[3].width is None and got[3].height is None
    assert got[3].resized_width is None and got[3].resized_height is None


def test_resize_only_images_and_aspect(mm):
    rows = resize_images(mm, 64, 64).collect()
    assert {r.doc_id for r in rows} == {0}  # only kind == image
    r = rows[0]
    assert max(r.resized_width, r.resized_height) <= 64
    # aspect preserved within integer truncation
    assert abs(r.resized_width / r.resized_height - r.width / r.height) < 0.2
