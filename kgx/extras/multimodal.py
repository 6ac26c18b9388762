"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side is REAL and tested — schema, partition-friendly layout,
Arrow-batched ``mapInPandas`` operators with correct batch shapes — while
the codec kernels are deterministic fakes behind ``KGX_FAKE_CODECS`` (the
sandbox ships no image/audio libraries): each fake derives its output from
sha256 of the payload bytes, so tests are stable and the real decoder can
drop in without touching any plan.  Operators: :func:`extract_features`
(decode + feature vector), :func:`resize_images` (1→1 payload transform),
:func:`sample_frames` (1→N frame explode — the UDTF shape).
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, feature array<float>, ok boolean"
)

_FEATURE_DIM = 16


def _fake_feature(payload: bytes) -> list[float]:
    h = hashlib.sha256(payload or b"").digest()
    arr = np.frombuffer(h[:_FEATURE_DIM * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def fake_payload(i: int) -> bytes:
    """Deterministic fake media payload for item ``i`` — the single source
    of truth shared by :func:`synthesize_media` and the fixture generator's
    precomputed oracle (kgx/fixtures/gen.py expected_multimodal_features),
    so the stamped expectation cannot drift from the kernel."""
    return hashlib.sha256(f"media{i}".encode()).digest() * (1 + i % 5)


def _decode_real(payload: bytes, kind: str):  # pragma: no cover - no codecs in sandbox
    raise NotImplementedError(
        "real image/audio decode requires PIL/libav, not present in this "
        "environment; run with KGX_FAKE_CODECS=1 (default) for the "
        "deterministic fake kernel"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """media (MEDIA_SCHEMA) -> per-item feature vectors via mapInPandas.

    Batches carry binary payloads, so upstream should cap
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` (kgx.session does);
    the kernel is one python call per Arrow batch, never per row.
    """
    fake = os.environ.get("KGX_FAKE_CODECS", "1") == "1"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                try:
                    if fake:
                        feats.append(_fake_feature(bytes(payload or b"")))
                    else:
                        feats.append(_decode_real(bytes(payload or b""), kind))
                    oks.append(True)
                except NotImplementedError:
                    raise
                except Exception:
                    feats.append([0.0] * _FEATURE_DIM)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(bytes(p or b"")) for p in pdf["payload"]],
                    "feature": feats,
                    "ok": oks,
                }
            )

    return media.mapInPandas(kernel, FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, payload binary, ok boolean"
)

FRAMES_SCHEMA = "media_id long, frame_idx int, ts_ms int, frame binary"


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """media (MEDIA_SCHEMA) -> resized image payloads via mapInPandas.

    Plumbing is real (Arrow binary in/out, one python call per batch,
    non-image rows pass through with ok=false); the resample kernel is the
    deterministic fake (sha256-seeded bytes of exactly width*height length)
    behind KGX_FAKE_CODECS — a PIL ``Image.resize`` drops into
    ``_resize_real`` without touching the plan."""
    fake = os.environ.get("KGX_FAKE_CODECS", "1") == "1"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fail fast on misconfiguration: raise before touching any row, not
        # mid-loop on the first image of some batch
        if not fake:
            raise NotImplementedError(
                "real image resize requires PIL; run with "
                "KGX_FAKE_CODECS=1 (default) for the fake kernel"
            )
        for pdf in batches:
            payloads, oks = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if kind != "image":
                    payloads.append(None)
                    oks.append(False)
                    continue
                seed = hashlib.sha256(
                    bytes(payload or b"") + f":{width}x{height}".encode()
                ).digest()
                reps = (width * height) // len(seed) + 1
                payloads.append((seed * reps)[: width * height])
                oks.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "payload": payloads,
                    "ok": oks,
                }
            )

    return media.mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000, max_frames: int = 8) -> DataFrame:
    """media (MEDIA_SCHEMA) -> 1→N frame rows per video via mapInPandas
    (the UDTF shape: one input row explodes to ``min(duration/every_ms,
    max_frames)`` output rows; non-video rows emit nothing).

    Frame extraction is the deterministic fake (sha256(payload, ts) bytes)
    behind KGX_FAKE_CODECS; a libav reader drops in without touching the
    plan, partitioning, or batch shape."""
    fake = os.environ.get("KGX_FAKE_CODECS", "1") == "1"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # fail fast on misconfiguration (see resize_images)
        if not fake:
            raise NotImplementedError(
                "real frame sampling requires libav; run with "
                "KGX_FAKE_CODECS=1 (default) for the fake kernel"
            )
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                if kind != "video":
                    continue
                duration = int((meta or {}).get("duration_ms") or 0)
                n_frames = min(max(duration // every_ms, 1), max_frames)
                for i in range(n_frames):
                    ts = i * every_ms
                    ids.append(media_id)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(
                        hashlib.sha256(bytes(payload or b"") + f"@{ts}".encode()).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    return media.mapInPandas(kernel, FRAMES_SCHEMA)


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        payload = fake_payload(i)
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "duration_ms": 1000 * (1 + i) if kind != "image" else None,
        }
        rows.append((i, kind, f"x-fake/{kind}", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
