"""Multimodal (image/audio/video) column plumbing.

Beyond-reference extension (BASELINE.json north star).  Media payloads
travel as opaque ``binary`` columns plus a typed metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators.  The actual codec work is STUBBED (the
image/audio libraries are not in this container): ``decode_fn`` defaults
to a deterministic fake that derives "features" from the bytes, and a
real implementation (PIL/librosa/ffmpeg) plugs in behind the same
signature.  The Spark-side contract — schema, batching, partition sizing
— is real and tested.

Design for 100 TB: media rows are large and skew-prone, so operators
repartition by a byte-size budget (``target_rows_per_batch``) rather than
row count, keep batches bounded via ``spark.sql.execution.arrow
.maxRecordsPerBatch``, and never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_DIM = 16


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: FEATURE_DIM floats derived
    from the sha256 of the payload.  Replace with a real decode (e.g.
    PIL.Image.open → pixel stats) without touching the Spark plumbing."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    digest = hashlib.sha256(payload).digest()
    return np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64) / 65535.0


def real_decode(payload: bytes) -> np.ndarray:  # pragma: no cover - container lacks codecs
    """Real decoder entry point — requires PIL/librosa, absent here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; use fake_decode"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode,
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """(media_id, payload, meta) → (media_id, features array<double>, n_bytes).

    mapInPandas keeps Arrow batches bounded; payloads never leave the
    executor.  The output drops the payload column so downstream stages
    (similarity, clustering) shuffle only the small feature vectors.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_fn(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    from atd_data_lake_spark.operators.scale import fan_out

    return fan_out(media).mapInPandas(op, schema=out_schema)


def extract_features_wide(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] = fake_decode,
    feature_dim: int = FEATURE_DIM,
) -> DataFrame:
    """``extract_features`` with a scalar-wide output
    (media_id, n_bytes, f0..f{dim-1}) instead of array<double>.

    One decode pass emits the feature matrix as ``feature_dim`` double
    COLUMNS straight from the Arrow batch (``np.vstack`` → columns), so
    neither side pays the per-row Python-list → Arrow-list → JVM
    element-extraction detour the array form needs when the consumer
    wants scalars anyway (the external driver canonicalizer sorts raw
    tuples and cannot take arrays).  Use the array form for composition
    with the similarity/clustering operators."""
    fields = [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ] + [T.StructField(f"f{i}", T.DoubleType()) for i in range(feature_dim)]
    out_schema = T.StructType(fields)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mat = (
                np.vstack([decode_fn(p) for p in pdf["payload"]])
                if len(pdf)
                else np.empty((0, feature_dim))
            )
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": [
                    len(p) if p is not None else 0 for p in pdf["payload"]
                ],
            }
            for i in range(feature_dim):
                out[f"f{i}"] = mat[:, i]
            yield pd.DataFrame(out)

    from atd_data_lake_spark.operators.scale import fan_out

    return fan_out(media).mapInPandas(op, schema=out_schema)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real image resize: returns a payload
    whose length scales with the target pixel count and whose content is
    derived from the source bytes (so tests can assert determinism and
    size behavior).  A real implementation (PIL thumbnail → re-encode)
    plugs in behind the same signature."""
    if payload is None:
        return b""
    digest = hashlib.sha256(payload).digest()
    n = max(1, (width * height) // 64)
    return (digest * (n // len(digest) + 1))[:n]


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn=fake_resize,
) -> DataFrame:
    """(media_id, payload, meta) → same schema with the payload replaced by
    the resized rendition and meta.width/height/n_bytes updated.

    The Spark-side contract is the real deliverable here: payloads stay
    executor-side in bounded Arrow batches, the output schema is identical
    to the input (so renditions drop into the same lake layout), and the
    stage is a pure map — zero shuffle at any corpus size.  The codec is
    stubbed (``fake_resize``) because image libraries are absent in this
    container."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            resized = [resize_fn(p, width, height) for p in pdf["payload"]]
            out["payload"] = resized
            out["meta"] = [
                {
                    **(m if isinstance(m, dict) else m.asDict()),
                    "width": width,
                    "height": height,
                    "n_bytes": len(r),
                }
                for m, r in zip(pdf["meta"], resized)
            ]
            yield out

    from atd_data_lake_spark.operators.scale import fan_out

    return fan_out(media).mapInPandas(op, schema=media.schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (media_id, frame_ms).  The decode of each frame is the stubbed step;
    the row explosion — the part that matters for partitioning — is real:
    a video of duration D produces D/every_ms rows, so the operator
    repartitions afterward to rebalance.
    """
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("long"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), (n_frames - 1) * every_ms, F.lit(every_ms))
        ).alias("frame_ms"),
    ).repartition("media_id")


def audio_window_plan(
    media: DataFrame, window_ms: int = 1000, hop_ms: int = 500
) -> DataFrame:
    """Audio windowing *plan*: one row per sliding analysis window
    (media_id, win_id, start_ms, end_ms) — the STFT/feature-frame layout
    every audio pipeline starts from.  Like ``frame_sample_plan``, the
    per-window decode/FFT is the stubbed codec boundary; the row
    explosion and repartition — the parts that matter for distribution —
    are real: a clip of duration D yields ⌊max(D−window, 0)/hop⌋ + 1
    rows (a clip shorter than one window still yields its single,
    zero-padded window, as librosa/torchaudio do).
    """
    n_wins = (
        F.greatest(F.col("meta.duration_ms") - window_ms, F.lit(0)) / hop_ms
    ).cast("long") + 1
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_wins - 1)).alias("win_id"),
    ).select(
        "media_id",
        "win_id",
        (F.col("win_id") * hop_ms).alias("start_ms"),
        (F.col("win_id") * hop_ms + window_ms).alias("end_ms"),
    ).repartition("media_id")
