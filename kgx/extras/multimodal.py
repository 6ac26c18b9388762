"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark side is REAL and tested — schema, partition-friendly layout,
Arrow-batched ``mapInPandas`` operators with correct batch shapes — while
the codec kernels are deterministic fakes behind ``KGX_FAKE_CODECS`` (the
sandbox ships no image/audio libraries): each fake derives its output from
sha256 of the payload bytes, so tests are stable and the real decoder can
drop in without touching any plan.
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
