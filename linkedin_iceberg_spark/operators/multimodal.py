"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Convention (SURVEY.md M7): a multimodal column set is
    <name>_uri     string        — source location
    <name>         binary        — opaque payload bytes
    <name>_meta    struct<mime string, size_bytes long, width int,
                          height int, duration_ms long>

Real media decode libraries (PIL/ffmpeg/librosa) are NOT in this
environment, so the decode kernels are deterministic fakes clearly marked
STUB; the Spark-side plumbing — schema, Arrow-batched ``mapInPandas``,
partition-preserving batch shape — is real and is what matters at 100 TB
(decode is embarrassingly parallel; the pattern is identical with a real
codec dropped into ``_decode_stub``).
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

META_TYPE = T.StructType([
    T.StructField("mime", T.StringType()),
    T.StructField("size_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
])


def attach_payload(df: DataFrame, src_col: str, name: str = "media",
                   mime: str = "application/octet-stream") -> DataFrame:
    """Wrap an existing column's bytes as a multimodal column set.
    (In production the binary would come from object-store reads; here any
    string/binary column works — e.g. documents.text.)"""
    payload = F.col(src_col).cast("binary")
    return (df
            .withColumn(name, payload)
            .withColumn(f"{name}_uri",
                        F.concat(F.lit("mem://"), F.sha1(payload)))
            .withColumn(f"{name}_meta", F.struct(
                F.lit(mime).alias("mime"),
                F.octet_length(payload).cast("long").alias("size_bytes"),
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"))))


def _decode_stub(payload: bytes) -> tuple:
    """STUB decode: deterministic (width, height) from the payload bytes.
    Replace with a real codec (PIL.Image.open etc.) when available; raise
    instead by calling decode_image(..., strict=True)."""
    if payload is None:
        return None, None
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def decode_image(df: DataFrame, name: str = "media",
                 strict: bool = False) -> DataFrame:
    """Fill width/height in <name>_meta by decoding the payload.

    Arrow-batched mapInPandas: whole partitions stream through pandas in
    record batches — no per-row Python call overhead, no shuffle, output
    partitioning == input partitioning."""
    if strict:
        raise NotImplementedError(
            "real image decode requires PIL/imageio (not installed); "
            "the stub path is decode_image(df, strict=False)")
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()  # mapInPandas closures import this module
    out_schema = df.schema

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[name].map(
                lambda b: _decode_stub(bytes(b)) if b is not None
                else (None, None))
            meta = pd.DataFrame(list(pdf[f"{name}_meta"]))
            meta["width"] = [d[0] for d in dims]
            meta["height"] = [d[1] for d in dims]
            pdf[f"{name}_meta"] = meta.to_dict("records")
            yield pdf

    return df.mapInPandas(decode, out_schema)


def extract_features(df: DataFrame, name: str = "media", dim: int = 8,
                     out_col: str = "features") -> DataFrame:
    """STUB feature extractor: deterministic float vector from payload bytes
    (stands in for an embedding model).  Same mapInPandas shape a real
    encoder would use — batched, partition-preserving."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()
    out_schema = T.StructType(
        [*df.schema.fields,
         T.StructField(out_col, T.ArrayType(T.FloatType()))])

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def vec(b):
                if b is None:
                    return None
                h = hashlib.sha256(bytes(b)).digest()
                return [round(h[i] / 255.0, 6) for i in range(dim)]
            pdf[out_col] = pdf[name].map(vec)
            yield pdf

    return df.mapInPandas(feats, out_schema)


def resize_image(df: DataFrame, name: str = "media", width: int = 64,
                 height: int = 64) -> DataFrame:
    """STUB resize: replaces the payload with a deterministic
    width*height-byte surrogate derived from the original (sha256-seeded
    repetition — a fixed-size 1-byte-per-pixel stand-in for a real
    PIL/libvips resample) and updates <name>_meta dims/size to the target.
    The Spark-side plumbing is exactly what a real kernel needs: one
    Arrow-batched mapInPandas, partition-preserving, binary in/out, and a
    meta struct kept consistent with the payload."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()
    out_schema = df.schema
    n_bytes = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def shrink(b):
                if b is None:
                    return None
                h = hashlib.sha256(bytes(b)).digest()
                reps = n_bytes // len(h) + 1
                return (h * reps)[:n_bytes]
            nulls = pdf[name].isna().tolist()
            pdf[name] = pdf[name].map(shrink)
            meta = pd.DataFrame(list(pdf[f"{name}_meta"]))
            # meta stays consistent with the payload: NULL payloads keep
            # their original meta (same convention as decode_image)
            keep = ~pd.Series(nulls, index=meta.index)
            meta.loc[keep, "width"] = width
            meta.loc[keep, "height"] = height
            meta.loc[keep, "size_bytes"] = n_bytes
            pdf[f"{name}_meta"] = meta.to_dict("records")
            yield pdf

    return df.mapInPandas(resize, out_schema)


def frame_sample(df: DataFrame, name: str = "media", every_n_bytes: int = 64,
                 max_frames: int = 4, out_col: str = "frames") -> DataFrame:
    """STUB frame sampler: slices the payload every N bytes (stands in for
    video frame extraction); returns array<binary>."""
    from linkedin_iceberg_spark.shipping import ship_to_active_session
    ship_to_active_session()
    out_schema = T.StructType(
        [*df.schema.fields,
         T.StructField(out_col, T.ArrayType(T.BinaryType()))])

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def frames(b):
                if b is None:
                    return None
                bb = bytes(b)
                return [bb[i:i + every_n_bytes]
                        for i in range(0, min(len(bb),
                                              every_n_bytes * max_frames),
                                       every_n_bytes)]
            pdf[out_col] = pdf[name].map(frames)
            yield pdf

    return df.mapInPandas(sample, out_schema)
