"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed in Arrow batches via ``mapInPandas``.

The decode kernels themselves are STUBBED — the image/audio libraries are not
in this container — behind ``decoder=`` hooks; the default is a deterministic
fake that derives "features" from the payload bytes, so the Spark-side
contract (schema, batch shape, partition behavior) is fully real and tested.
Swap ``fake_decode_image`` for a PIL/libjpeg kernel in production; nothing
else changes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int"
)

FEATURE_DIM = 8


def fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: FEATURE_DIM moments of
    the byte histogram.  Replace with a real decode+CNN featurizer."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    feats = [
        arr.mean(),
        arr.std(),
        arr.min(),
        arr.max(),
        float(len(arr)),
        arr[: len(arr) // 2].mean() if len(arr) > 1 else 0.0,
        arr[len(arr) // 2 :].mean() if len(arr) > 1 else 0.0,
        float((arr > 127).mean()),
    ]
    return np.array(feats, dtype=np.float32)


def real_decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    """The production kernel — requires an image library not present here."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; not available in this environment"
    )


def fake_decode_stats(payload: bytes) -> np.ndarray:
    """Oracle-checkable stand-in decoder: FEATURE_DIM byte statistics, each an
    exact-integer ratio (sum/len, count/len, ...).  Integer sums below 2^53
    are exact in float64 and IEEE division is correctly rounded, so a SQL
    engine computing the same sums gets bit-identical doubles — this is what
    lets the driver verify the mapInPandas plumbing against DuckDB."""
    if not payload:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    n = len(arr)
    half = n // 2
    return np.array(
        [
            arr.sum() / n,                                    # mean
            arr.min(),                                        # min byte
            arr.max(),                                        # max byte
            float(n),                                         # length
            float((arr > 100).sum()) / n,                     # frac > 100
            arr[:half].sum() / half if n > 1 else 0.0,        # first-half mean
            arr[half:].sum() / (n - half) if n > 1 else 0.0,  # second-half mean
            (arr * arr).sum() / n,                            # mean of squares
        ],
        dtype=np.float64,
    )


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode_image,
    out_col: str = "features",
) -> DataFrame:
    """(media_id, kind, features array<float>) — Arrow-batched feature
    extraction; the decoder runs per row inside a vectorized batch loop (the
    unavoidable shape for opaque binary decoding), everything around it is
    columnar."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = [decoder(p).tolist() for p in b["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    out_col: feats,
                }
            )

    return media.mapInPandas(
        run, f"media_id long, kind string, {out_col} array<float>"
    )


def extract_media_feature_stats(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode_stats,
) -> DataFrame:
    """Scalar-column form of :func:`extract_media_features` — one double
    column per feature (``f0..f7``) instead of ``array<float>``, so the
    output is hashable by tabular harnesses and oracle-checkable row-for-row
    (the array form stays available above for vector consumers)."""
    cols = [f"f{i}" for i in range(FEATURE_DIM)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = np.stack([decoder(p) for p in b["payload"]]) if len(b) else (
                np.zeros((0, FEATURE_DIM))
            )
            out = {"media_id": b["media_id"], "kind": b["kind"]}
            for i, c in enumerate(cols):
                out[c] = feats[:, i]
            yield pd.DataFrame(out)

    schema = "media_id long, kind string, " + ", ".join(f"{c} double" for c in cols)
    return media.mapInPandas(run, schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    pure Column math (sequence explode), the actual frame decode being the
    stubbed kernel above."""
    from pyspark.sql import functions as F

    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.lit(0), F.col("duration_ms") - 1),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
