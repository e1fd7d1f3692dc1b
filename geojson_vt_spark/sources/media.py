"""Multimodal spans: opaque binary payloads + typed metadata, with the
decode / feature-extract / resize / frame-sample stages as Arrow-batched
kernels over mapInPandas.

The input_hint's interleaved documents carry `media_ref` spans; this module
gives them a real Spark shape: a `media` table (binary payload + kind +
typed metadata struct), per-kind decode kernels, and a stats query. The
image/audio/video codec libraries are NOT in this container, so the byte-
level decode is STUBBED with a deterministic fake (documented below); the
Spark-side plumbing — binary columns through Arrow, per-kind dispatch,
batch-shaped kernels, metadata schema — is real and tested. Swap
`_fake_decode_*` for PIL/librosa/pyav calls (the guarded import shows
where) and nothing else changes.

Real-decoder status — CONTRACT-FINAL in this sandbox (ruled 2026-08-19,
round 4): wiring PIL behind the stub gate was attempted and is impossible
here — `import PIL` fails, no wheel exists on disk, pip is forbidden and
there is no network to fetch one. The gate below stays so a deployment
where PIL IS importable fails loudly instead of serving fabricated stats.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

try:  # real decoders, if ever present in the image
    import PIL.Image  # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("width", T.LongType(), True),  # image/video
        T.StructField("height", T.LongType(), True),
        T.StructField("n_samples", T.LongType(), True),  # audio
        T.StructField("sample_rate", T.LongType(), True),
        T.StructField("n_frames", T.LongType(), True),  # video
        T.StructField("sampled_frames", T.ArrayType(T.LongType()), True),
    ]
)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive the media table from the documents corpus: one span per doc,
    kind round-robins by doc_id, payload = the doc's text bytes (stands in
    for the blob a media_ref would fetch; deterministic, so oracles can
    recompute every downstream stat from `length(text)`)."""
    kind = (
        F.when(F.pmod("doc_id", F.lit(3)) == 0, "image")
        .when(F.pmod("doc_id", F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").cast("long"),
        F.concat(F.lit("ref://"), kind, F.lit("/"), F.col("doc_id")).alias(
            "media_ref"
        ),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_decode_image(payload: bytes):
    # STUB: deterministic stand-in for PIL.Image.open(io.BytesIO(payload))
    n = len(payload)
    return 16 + n % 240, 16 + (n * 7) % 240


def _fake_decode_audio(payload: bytes):
    # STUB: deterministic stand-in for an audio codec
    n = len(payload)
    return n * 4, 16000


def _fake_decode_video(payload: bytes):
    # STUB: deterministic stand-in for container demux + frame count probe
    n = len(payload)
    return 32 + n % 224, 32 + (n * 3) % 224, 1 + n % 30


def decode_media(media: DataFrame, frame_stride: int = 5) -> DataFrame:
    """Per-kind decode/probe as one Arrow-batched kernel. Video also
    frame-samples every `frame_stride`-th frame (the training-pipeline
    pattern: decode -> sample -> feature-extract)."""

    # Real codecs (PIL/librosa/pyav) are not wired up; the kernel emits
    # deterministic STUB decode output. A deployment where PIL IS importable
    # must not mistake fabricated widths/sample counts for real decodes:
    # require the explicit opt-in there (tests set it; codec-less containers
    # are unambiguous and run the stub silently).
    if _HAVE_PIL and os.environ.get("SPARK_GRAFT_MEDIA_FAKE") != "1":
        raise NotImplementedError(
            "real media codecs are importable here but decode_media only "
            "implements the deterministic stub — set SPARK_GRAFT_MEDIA_FAKE=1 "
            "to acknowledge stub output, or wire _fake_decode_* to the real "
            "decoders (geojson_vt_spark/sources/media.py)"
        )

    # every stub stat is a pure function of len(payload) and kind, so the
    # whole Arrow batch is processed with numpy column ops: per-kind boolean
    # masks + modular arithmetic on the length vector, and a 30-entry LUT for
    # the (bounded) video frame-sample lists. Real codecs will be per-row by
    # nature; the stub must not be (it was the one per-row loop in the repo).
    # object-dtype LUT filled entry-by-entry (31 constant iterations): fancy
    # indexing into it keeps every row's list as an opaque object reference.
    # Assigning a list-of-lists through a boolean mask is NOT safe — numpy
    # promotes equal-length inner lists to a 2-D array and the masked
    # assignment raises (a batch holding one video, or frame_stride >= 30,
    # makes every list the same length).
    frames_lut = np.empty(31, dtype=object)
    for nf in range(1, 31):
        frames_lut[nf] = list(range(0, nf, frame_stride))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy(dtype=np.int64)
            kind = pdf["kind"].to_numpy()
            is_img = kind == "image"
            is_aud = kind == "audio"
            is_vid = ~is_img & ~is_aud

            def masked(values, mask):
                col = np.where(mask, values, 0).astype(object)
                col[~mask] = None
                return col

            width = np.where(is_img, 16 + n % 240, 32 + n % 224)
            height = np.where(is_img, 16 + (n * 7) % 240, 32 + (n * 3) % 224)
            n_frames = 1 + n % 30
            wh_mask = is_img | is_vid
            sampled = np.full(len(n), None, dtype=object)
            if is_vid.any():
                sampled[is_vid] = frames_lut[n_frames[is_vid]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": n,
                    "width": masked(width, wh_mask),
                    "height": masked(height, wh_mask),
                    "n_samples": masked(n * 4, is_aud),
                    "sample_rate": masked(np.full(len(n), 16000), is_aud),
                    "n_frames": masked(n_frames, is_vid),
                    "sampled_frames": sampled,
                }
            )

    return media.mapInPandas(kernel, DECODED_SCHEMA)


def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-kind stats over the decoded media table. Every decoded field is a
    deterministic function of the payload length (== length(text)), so the
    DuckDB oracle recomputes the whole pipeline relationally."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    decoded = decode_media(media_from_documents(docs))
    return (
        decoded.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum(F.coalesce(F.col("width"), F.lit(0))).alias("sum_width"),
            F.sum(F.coalesce(F.col("n_samples"), F.lit(0))).alias("sum_samples"),
            F.sum(F.coalesce(F.size("sampled_frames"), F.lit(0))).cast("long").alias(
                "sum_sampled"
            ),
        )
    )


SQL_MEDIA_DECODE_STATS = """
WITH media AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
         strlen(text) AS n_bytes
  FROM documents
), decoded AS (
  SELECT kind, n_bytes,
         CASE WHEN kind = 'image' THEN 16 + n_bytes % 240
              WHEN kind = 'video' THEN 32 + n_bytes % 224 ELSE 0 END AS width,
         CASE WHEN kind = 'audio' THEN n_bytes * 4 ELSE 0 END AS n_samples,
         CASE WHEN kind = 'video'
              THEN CAST(CEIL((1 + n_bytes % 30) / 5.0) AS BIGINT) ELSE 0 END AS n_sampled
  FROM media
)
SELECT kind, COUNT(*) AS n_media,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(width) AS BIGINT) AS sum_width,
       CAST(SUM(n_samples) AS BIGINT) AS sum_samples,
       CAST(SUM(n_sampled) AS BIGINT) AS sum_sampled
FROM decoded GROUP BY kind
"""


QUERIES = {"media_decode_stats": q_media_decode_stats}
ORACLES = {"media_decode_stats": SQL_MEDIA_DECODE_STATS}
