"""MinHash signatures + LSH banding (SURVEY §2 C2; BASELINE.json:L6
"minhash-banded candidate generation").

k=64 permutations over character 3-shingles of the normalized surface,
banded b=16 × r=4 (50%-Jaccard S-curve midpoint ≈ (1/16)^(1/4) ≈ 0.5 — an
edit-distance-1 corruption of an 8+ char name sits well above it).

The kernel is numpy over Arrow batches (scalar pandas UDF); hashes are
crc32-seeded (PYTHONHASHSEED-independent → deterministic across workers,
sessions, and resumes).  Replaces the quadratic name-similarity join with an
equi-join on (band_id, band_hash) — SURVEY §4 "join-space reduction".
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx.text.normalize import norm_term

K = 64  # permutations
BANDS = 32
ROWS = 2  # K == BANDS * ROWS; S-curve midpoint (1/32)^(1/2) ≈ 0.18 —
# permissive on purpose: short names at edit distance 1 can drop to ~0.3
# Jaccard, and the exact rerank (not the banding) is the precision gate
_P = (1 << 61) - 1  # Mersenne prime for the universal-hash family

_rs = np.random.RandomState(42)
_A = _rs.randint(1, _P, size=K, dtype=np.int64)
_B = _rs.randint(0, _P, size=K, dtype=np.int64)
_BAND_MIX = np.uint64(0x9E3779B97F4A7C15).astype(np.int64)  # golden-ratio mix


def _grams(s: str) -> set[str]:
    """Mixed 2- and 3-shingles: robust for both short trivial names and long
    systematic names (a pure-3-shingle set collapses under one edit on a
    6-char word)."""
    if not s:
        return set()
    if len(s) <= 2:
        return {s}
    out = {s[i : i + 2] for i in range(len(s) - 1)}
    out.update(s[i : i + 3] for i in range(len(s) - 2))
    return out


def shingle_hashes(s: str) -> np.ndarray:
    """Deterministic int64 hashes of the mixed shingles of a normalized string."""
    grams = _grams(s)
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.fromiter((zlib.crc32(g.encode("utf-8")) for g in grams), dtype=np.int64)


def signature(sh: np.ndarray) -> np.ndarray:
    """(n_shingles,) -> (K,) minhash signature."""
    if sh.size == 0:
        return np.zeros(K, dtype=np.int64)
    # (K, n) universal hashes; python-int modulus avoided by staying < 2^61
    with np.errstate(over="ignore"):
        hs = (_A[:, None] * sh[None, :] + _B[:, None]) % _P
    return hs.min(axis=1).astype(np.int64)


def band_hashes(sig: np.ndarray) -> list[int]:
    """(K,) signature -> BANDS int64 band keys (band id mixed in)."""
    out = []
    with np.errstate(over="ignore"):
        for b in range(BANDS):
            chunk = sig[b * ROWS : (b + 1) * ROWS]
            h = np.int64(b + 1)
            for v in chunk:
                h = np.int64(h * _BAND_MIX) ^ np.int64(v)
            out.append(int(h))
    return out


@F.pandas_udf(T.ArrayType(T.LongType()))
def minhash_bands_udf(texts: pd.Series) -> pd.Series:
    """normalized text -> array<long> of BANDS band keys (Arrow-batched)."""
    return texts.map(lambda s: band_hashes(signature(shingle_hashes(s if isinstance(s, str) else ""))))


def with_bands(df: DataFrame, text_col: str) -> DataFrame:
    """Attach exploded (band_id, band_hash) rows for LSH candidate joins."""
    return (
        df.withColumn("__bands", minhash_bands_udf(F.col(text_col)))
        .select("*", F.posexplode("__bands").alias("band_id", "band_hash"))
        .drop("__bands")
    )


def fuzzy_jaccard(a: str, b: str) -> float:
    """Exact mixed-shingle Jaccard (rerank-side ground metric; same shingle
    definition as the minhash, so rerank bounds banding recall)."""
    sa, sb = _grams(norm_term(a)), _grams(norm_term(b))
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)
