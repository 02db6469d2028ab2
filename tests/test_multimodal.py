"""Multimodal column convention + Arrow-batched decode/feature/frame
operators (SURVEY.md M7).  Decode kernels are deterministic stubs; the
Spark plumbing (schema, mapInPandas batching, partitioning) is real."""

import os

import pytest
from pyspark.sql import functions as F

from linkedin_iceberg_spark.operators.multimodal import (
    attach_payload,
    decode_image,
    extract_features,
    frame_sample,
)


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_attach_payload_schema(docs):
    df = attach_payload(docs, "text", name="img", mime="image/fake")
    fields = dict(df.dtypes)
    assert fields["img"] == "binary"
    assert fields["img_uri"] == "string"
    assert "struct" in fields["img_meta"]
    row = df.select("img_meta.size_bytes", F.length("text").alias("n")) \
        .first()
    assert row["size_bytes"] == row["n"]


def test_decode_stub_fills_dims(docs):
    df = decode_image(attach_payload(docs, "text", name="img"), name="img")
    dims = df.select("img_meta.width", "img_meta.height").toPandas()
    assert dims["width"].between(16, 255).all()
    assert dims["height"].between(16, 255).all()
    # deterministic: same payload -> same dims
    again = decode_image(attach_payload(docs, "text", name="img"), name="img") \
        .select("img_meta.width").toPandas()
    assert (dims["width"] == again["width"]).all()


def test_decode_strict_raises(docs):
    with pytest.raises(NotImplementedError):
        decode_image(attach_payload(docs, "text"), strict=True)


def test_extract_features_shape(docs):
    df = extract_features(attach_payload(docs, "text"), dim=8)
    pdf = df.select("features").limit(20).toPandas()
    assert all(len(v) == 8 for v in pdf["features"])
    assert all(0.0 <= x <= 1.0 for v in pdf["features"] for x in v)


def test_frame_sample(docs):
    df = frame_sample(attach_payload(docs, "text"), every_n_bytes=32,
                      max_frames=3)
    pdf = df.select("frames", F.octet_length("media").alias("n")) \
        .limit(20).toPandas()
    for frames, n in zip(pdf["frames"], pdf["n"]):
        assert 1 <= len(frames) <= 3
        assert len(frames[0]) == min(32, n)


def test_resize_image_fixed_size_and_meta(docs):
    from linkedin_iceberg_spark.operators.multimodal import resize_image
    df = resize_image(attach_payload(docs, "text", name="img"), name="img",
                      width=8, height=4)
    pdf = df.select("img", "img_meta.width", "img_meta.height",
                    "img_meta.size_bytes").limit(20).toPandas()
    for _i, r in pdf.iterrows():
        assert len(r["img"]) == 32
        assert (r["width"], r["height"], r["size_bytes"]) == (8, 4, 32)
    # deterministic: same input -> same surrogate payload
    a = df.select("img").limit(5).collect()
    b = resize_image(attach_payload(docs, "text", name="img"), name="img",
                     width=8, height=4).select("img").limit(5).collect()
    assert [r.img for r in a] == [r.img for r in b]
