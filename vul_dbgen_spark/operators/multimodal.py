"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media are opaque ``binary`` payload columns with a typed metadata struct —
the schema/partitioning/UDF-signature layer a 100 TB multimodal corpus
needs, independent of any particular codec.

Decode strategy (this container has no image/audio libraries):
- the Spark-side plumbing is REAL: Arrow-batched ``mapInPandas`` over
  binary columns, explicit output schemas, per-batch vectorized work;
- the codec call itself is STUBBED: ``_try_real_decode`` raises
  ``NotImplementedError`` unless Pillow is importable, and the pipeline
  falls back to a clearly-marked DETERMINISTIC FAKE decode (features
  derived from payload bytes: length, sha256, synthetic dimensions).
  Swapping in a real decoder only replaces the per-row function body —
  schema, batching and distribution are unchanged.

At scale: mapInPandas streams Arrow batches (no per-row Python overhead);
payloads never shuffle unless the caller aggregates them — all feature
outputs are small fixed-width columns, so downstream joins/aggs move
kilobytes per million media rows, not the media itself.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def synth_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Derive an opaque-binary media table from a text corpus.

    Deterministic stand-in for a real media lake: payload = utf-8 bytes of
    the text, media_type cycles image/audio/video by id. Real pipelines
    swap this for ``spark.read.format('binaryFile')``; everything
    downstream only sees (id, media_type, payload, meta).
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.lit("raw").alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _try_real_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image decode — STUB. Raises unless an image library exists."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # expected in this container
        raise NotImplementedError("no image codec available") from exc
    import io

    from PIL import Image

    with Image.open(io.BytesIO(payload)) as im:
        return im.width, im.height, len(im.getbands())


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: synthetic dims from payload length.

    Stands in for the codec so the distributed plumbing is testable and
    oracle-verifiable; mirrored exactly by the DuckDB oracle SQL.
    """
    n = len(payload)
    return 16 + n % 97, 16 + (n * 31) % 97, 3


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sha16", StringType()),
    ]
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract images: Arrow-batched mapInPandas over the
    binary payload → fixed-width feature rows.

    Tries the real codec once per batch; falls back to the deterministic
    fake (see module docstring). Output is narrow — the payload column
    dies at this operator, so nothing heavy flows downstream.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    w, h, c = _try_real_decode(b)
                except NotImplementedError:
                    w, h, c = _fake_decode(b)
                rows.append(
                    (
                        int(mid),
                        len(b),
                        w,
                        h,
                        c,
                        hashlib.sha256(b).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_len", IntegerType()),
        StructField("frame_sha16", StringType()),
    ]
)


def frame_sample(
    media: DataFrame, frame_bytes: int = 64, every_k: int = 2
) -> DataFrame:
    """Video frame sampling: split each payload into fixed-size frames and
    keep every k-th (frame 0, k, 2k, …) — the standard decimation pattern,
    with the actual frame decode stubbed to (length, sha256).

    One media row fans out to ceil(n/frame_bytes)/k rows; done inside
    mapInPandas so the payload is read once per row and only narrow
    per-frame features are emitted.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    fr = b[i * frame_bytes : (i + 1) * frame_bytes]
                    rows.append(
                        (int(mid), i, len(fr), hashlib.sha256(fr).hexdigest()[:16])
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(batches, FRAME_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("duration_s", StringType()),  # fixed-format string: exact compare
        StructField("mean_byte", IntegerType()),
    ]
)


def audio_features(media: DataFrame, sample_rate: int = 16000) -> DataFrame:
    """Audio feature extraction (duration at a nominal sample rate + mean
    byte value as an energy proxy) — codec stubbed, plumbing real.

    duration is emitted as a fixed 6-decimal string so exact equality
    holds across engines (no float wobble in the oracle compare).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    (
                        int(mid),
                        len(b),
                        f"{len(b) / sample_rate:.6f}",
                        int(sum(b) // len(b)) if b else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(batches, AUDIO_SCHEMA)
