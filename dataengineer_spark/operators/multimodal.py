"""Multimodal columns (SURVEY.md §2.9): image/audio/video as opaque

``binary`` payloads plus typed metadata (schemas.MEDIA). The Spark-side
plumbing — schema, partition sizing, Arrow batch shape through
``mapInPandas`` — is real and tested; the codec step itself is stubbed
(image/audio libraries are not in this container): ``decode_*`` raise
``NotImplementedError`` unless ``deterministic_fake=True``, which produces
seeded fake features so pipelines exercise end-to-end.

Scale notes: payloads never pass through a shuffle unless the caller asks
for one — feature extraction is a narrow ``mapInPandas`` over the scan;
binary-heavy tables should set ``spark.sql.files.maxPartitionBytes`` low
enough that one Arrow batch of payloads fits executor memory.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_DIM = 16

_FEATURE_SCHEMA = (
    "media_id long, kind string, feature array<float>, feat_norm double"
)


_POLY_MOD = 1_000_003  # preparation.portable_word_hash's modulus


def _fake_feature(payload: bytes | None, dim: int) -> np.ndarray:
    """Deterministic stand-in for a decoder+encoder: poly-hash the first

    64 chars of the payload's UTF-8 decode (the same ``(acc*31 + cp) %
    1_000_003`` fold as ``preparation.portable_word_hash``), then expand
    to ``dim`` values by per-dim affine transforms mod the same prime.
    Engine-portable by construction — for valid-UTF-8 payloads a SQL
    oracle replays the fold and the affine expansion bit-for-bit, so the
    multimodal plumbing is hash-verifiable end to end, not rows-only."""
    if payload is None:
        return np.zeros(dim, dtype=np.float32)
    h = 0
    for ch in bytes(payload).decode("utf-8", "replace")[:64]:
        h = (h * 31 + ord(ch)) % _POLY_MOD
    vals = [((h * (2 * i + 3) + 97 * i) % _POLY_MOD) / float(_POLY_MOD) for i in range(dim)]
    return np.array(vals, dtype=np.float32)


def _feat_norm(f: np.ndarray) -> float:
    """L2 norm as an explicit double left fold (float32 inputs widened
    per element) — the float-op order a SQL oracle can reproduce."""
    acc = 0.0
    for x in f:
        acc = acc + float(x) * float(x)
    return math.sqrt(acc)


def extract_features(
    media: DataFrame, deterministic_fake: bool = False, dim: int = IMAGE_FEATURE_DIM
) -> DataFrame:
    """Decode payloads → feature vectors via ``mapInPandas``.

    Real decoders (PIL/librosa/ffmpeg) plug into ``_decode_batch``; absent
    here, the deterministic fake keeps the distributed plumbing testable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media codecs not available in this environment; "
                    "pass deterministic_fake=True or install decoders"
                )
            feats = [_fake_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "feat_norm": [_feat_norm(f) for f in feats],
                }
            )

    return media.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, deterministic_fake: bool = False
) -> DataFrame:
    """Image resize plumbing: binary in → binary out, metadata updated.

    The fake 'resize' truncates/pads the payload to width·height bytes so
    batch shapes and schema behavior are exercised without a codec.
    """

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("image codecs not available; see docstring")
            out = pdf.copy()
            out["payload"] = [
                None if p is None else bytes(p)[:target].ljust(target, b"\0")
                for p in pdf["payload"]
            ]
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(run, schema=media.schema)


def sample_frames(
    media: DataFrame, every_ms: int, deterministic_fake: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: one row in → N frame rows out

    (``mapInPandas`` lets output cardinality differ from input). Fake
    frames slice the payload at every_ms boundaries of duration_ms.
    """

    schema = "media_id long, frame_idx int, frame_ms long, frame binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError("video codecs not available; see docstring")
            rows = []
            for _, r in pdf.iterrows():
                # NULL duration arrives as NaN (Arrow renders a nullable
                # long column as float64) and NaN is truthy — `or 0`
                # passes it through and int(NaN) raises
                raw_dur = r["duration_ms"]
                dur = 0 if raw_dur is None or pd.isna(raw_dur) else int(raw_dur)
                payload = bytes(r["payload"] or b"")
                n = max(dur // every_ms, 1) if dur else 1
                step = max(len(payload) // n, 1)
                for i in range(n):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_ms": i * every_ms,
                            "frame": payload[i * step : (i + 1) * step],
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ms", "frame"])

    return media.mapInPandas(run, schema=schema)


def media_stats(media: DataFrame) -> DataFrame:
    """Per-kind stats with no payload decode. When the table carries an

    ``n_bytes`` metadata column (the recommended lake layout for media
    tables), the binary column is pruned from the scan entirely (check
    ReadSchema); otherwise the payload is read once for its length."""
    size = (
        F.col("n_bytes") if "n_bytes" in media.columns else F.length("payload")
    )
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg(size).alias("avg_bytes"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )
