"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature libraries (PIL, ffmpeg, torchaudio, ...) are NOT in this
container, so the decode step is STUBBED behind ``_decode_image`` — a
deterministic fake guarded by an import-try (drop-in replaceable by a real
decoder). Everything Spark-side is real and tested: the schema, the
mapInPandas batch shape, partitioning behavior, and the metadata math.

Batch sizing note for 100 TB: binary payloads make rows wide — the caller
should lower spark.sql.execution.arrow.maxRecordsPerBatch (e.g. 256) and
spark.sql.files.maxPartitionBytes so an Arrow batch of decoded frames fits
executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),        # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta_json", T.StringType()),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("n_bytes", T.IntegerType()),
    T.StructField("sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])

try:  # pragma: no cover - not available in this container
    from PIL import Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def _decode_image(content: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma). STUB: without PIL this is a
    deterministic fake derived from the content hash — the Spark plumbing
    (schema, batching, partitioning) is what's under test here."""
    if _HAVE_PIL:
        raise NotImplementedError(
            "real decode path intentionally unimplemented in sandbox")
    h = hashlib.sha256(content).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mean_luma = round(h[2] / 255.0, 6)
    return width, height, mean_luma


def image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract over binary image content."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                b = bytes(content)
                w, hgt, luma = _decode_image(b)
                rows.append((media_id, len(b),
                             hashlib.sha256(b).hexdigest(), w, hgt, luma))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "sha256", "width", "height",
                "mean_luma"])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "content")
            .mapInPandas(batches, IMAGE_FEATURES_SCHEMA))


def frame_sample_plan(media: DataFrame, every_n_seconds: int = 5) -> DataFrame:
    """Video frame-sampling plan: JVM-side expansion of (media_id, ts_offset)
    rows from the duration metadata — the decode of each frame would run in
    a downstream mapInPandas like image_features."""
    dur = F.get_json_object("meta_json", "$.duration_s").cast("int")
    return (media.filter(F.col("kind") == "video")
            .select("media_id", dur.alias("duration_s"))
            .filter(F.col("duration_s").isNotNull())
            .select("media_id", F.posexplode(F.sequence(
                F.lit(0), F.col("duration_s") - 1,
                F.lit(every_n_seconds))).alias("frame_idx", "ts_offset_s")))


def resize_plan(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning from decoded dims (pure JVM math; the pixel work
    would live in the decode UDF)."""
    scale = F.least(F.lit(max_side) / F.col("width"),
                    F.lit(max_side) / F.col("height"), F.lit(1.0))
    return df.select(
        "media_id", "width", "height",
        F.round(F.col("width") * scale).cast("int").alias("out_width"),
        F.round(F.col("height") * scale).cast("int").alias("out_height"))
