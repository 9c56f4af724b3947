"""Multimodal columns: opaque binary payloads + typed metadata.

Reference: profilepics.py:30-90 (S10) wgets avatar images and records
them in the ``images`` collection. Here media is an opaque ``binary``
column travelling WITH the row (the interleaved-span model carries a
``media_ref`` per span; this module is the side table those refs point
into), and per-modality processing runs as Arrow-batched ``mapInPandas``
— the Spark-side plumbing (schema, batching, partitioning) is real; the
codec step is stubbed because no image/audio libs ship in this sandbox.

  attach_media         synthesize/attach binary payloads (deterministic)
  extract_metadata     mapInPandas: bytes -> (kind, n_bytes, sha-like id,
                       width/height/duration stub fields)
  decode_image         STUB — raises NotImplementedError unless a
                       deterministic fake decoder is requested
  frame_sample         video -> frame index plan (pure DataFrame op)
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "media_ref string, media_kind string, n_bytes long, content_id string, "
    "width int, height int, duration_ms int"
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic opaque payload per row + a typed kind column."""
    kind = (
        F.when(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(3)) == 0, "image")
        .when(F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return df.select(
        F.col(id_col).cast("string").alias("media_ref"),
        kind.alias("media_kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def extract_metadata(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.

    ``fake_decode=True`` derives deterministic width/height/duration
    from the payload hash (the codec stand-in); ``False`` raises in the
    decode step, which is the honest no-codec-in-sandbox behavior.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake_decode:
                raise NotImplementedError(
                    "real image/audio decode needs PIL/ffmpeg — not in sandbox"
                )
            digests = [hashlib.sha1(b).hexdigest() for b in pdf["payload"]]
            seeds = [int(d[:8], 16) for d in digests]
            is_img = pdf["media_kind"] == "image"
            is_vid = pdf["media_kind"] == "video"
            out = pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_kind": pdf["media_kind"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "content_id": digests,
                    "width": [
                        (64 + s % 1920) if (i or v) else 0
                        for s, i, v in zip(seeds, is_img, is_vid)
                    ],
                    "height": [
                        (64 + (s >> 8) % 1080) if (i or v) else 0
                        for s, i, v in zip(seeds, is_img, is_vid)
                    ],
                    "duration_ms": [
                        (1000 + s % 600000) if not i else 0
                        for s, i in zip(seeds, is_img)
                    ],
                }
            )
            yield out.astype(
                {"n_bytes": "int64", "width": "int32", "height": "int32",
                 "duration_ms": "int32"}
            )

    return media.mapInPandas(run, schema=META_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """STUB: pixel decode requires an image codec not present here."""
    raise NotImplementedError(
        "image decode stub — wire PIL/torchvision via extract_metadata's "
        "mapInPandas shape when codecs are available"
    )


def frame_sample(meta: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame timestamp —
    pure DataFrame op (sequence + explode), ready to feed a decoder."""
    vids = meta.where(F.col("media_kind") == "video")
    return vids.select(
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ms"),
    )
