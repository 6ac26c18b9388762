"""Deduplication operators for large text corpora.

* :func:`exact_dedup`    — hash-groupBy on sha256(text): one shuffle on the
  digest (never on the text itself), deterministic representative.
* :func:`minhash_dedup`  — shingle → minhash → banded LSH self-join →
  exact-Jaccard verify → connected components → cluster ids.  Reuses the
  entity-linking LSH (kgx.link.minhash) and the canonicalization CC kernel
  (kgx.canon.cc), so its scale posture (broadcast-hot/shuffle-cold joins,
  per-round localCheckpoint) is inherited, not re-invented.
* :func:`simhash_dedup`  — 64-bit simhash over token hashes; near-dup =
  Hamming distance ≤ 3 found via 4×16-bit chunk banding (any chunk equal).

All Python work is Arrow-batched (pandas UDFs); joins/groupBys are JVM.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx.canon.cc import connected_components
from kgx.link.minhash import fuzzy_jaccard, minhash_bands_udf


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> input + ``dup_group`` (sha256 digest) + ``is_canonical`` (min id
    per digest).  Filter ``is_canonical`` to drop exact duplicates."""
    digest = F.sha2(F.col(text_col), 256)
    w = Window.partitionBy("dup_group").orderBy(id_col)
    return (
        df.withColumn("dup_group", digest)
        .withColumn("is_canonical", F.row_number().over(w) == 1)
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str,
    id_col: str,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """-> (id_col, cluster_id) where near-duplicate docs (shingle Jaccard ≥
    threshold) share a cluster_id (the min doc id of the cluster).

    Plan shape: bands explode (Arrow UDF) → self-equi-join on
    (band_id, band_hash) with id< id to halve pairs → exact-Jaccard verify
    in an Arrow-batched UDF → CC over surviving pairs.  The band join is a
    shuffle on band hashes — uniform by construction — and the verify UDF
    sees only band-colliding pairs, so Python volume tracks true near-dups.
    """
    ids = df.select(F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text"))
    bands = ids.withColumn("__bands", minhash_bands_udf(F.col("__text"))).select(
        "__id", "__text", F.posexplode("__bands").alias("band_id", "band_hash")
    )

    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(
            F.col("a.__id").alias("src"),
            F.col("b.__id").alias("dst"),
            F.col("a.__text").alias("__ta"),
            F.col("b.__text").alias("__tb"),
        )
        .dropDuplicates(["src", "dst"])
    )

    @F.pandas_udf(T.DoubleType())
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        return pd.Series([fuzzy_jaccard(x or "", y or "") for x, y in zip(ta, tb)])

    verified = (
        pairs.withColumn("__j", _jac("__ta", "__tb"))
        .filter(F.col("__j") >= jaccard_threshold)
        .select("src", "dst")
    )

    comps = connected_components(verified)
    clusters = comps.select(F.col("node_id").alias("__id"), F.col("component_id").alias("cluster_id"))
    # singletons (no near-dup) keep their own id as cluster id
    return (
        ids.select("__id")
        .join(clusters, "__id", "left")
        .select(
            F.col("__id").alias(id_col),
            F.coalesce("cluster_id", F.col("__id")).alias("cluster_id"),
        )
    )


# --- simhash ---------------------------------------------------------------

_SIM_BITS = 64
_CHUNKS = 4  # 4 × 16-bit chunks: Hamming ≤ 3 guarantees ≥1 equal chunk


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit simhash over whitespace-token crc32 hashes (deterministic)."""
    import zlib

    def one(s: str) -> int:
        acc = np.zeros(_SIM_BITS, dtype=np.int64)
        for tok in (s or "").lower().split():
            h = zlib.crc32(tok.encode("utf-8"))
            h = (h << 32) | zlib.crc32(tok[::-1].encode("utf-8"))
            for i in range(_SIM_BITS):
                acc[i] += 1 if (h >> i) & 1 else -1
        out = 0
        for i in range(_SIM_BITS):
            if acc[i] > 0:
                out |= 1 << i
        return out - (1 << 64) if out >= (1 << 63) else out  # to signed

    return texts.map(one)


def simhash_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """-> (id, id2) candidate near-dup pairs with Hamming(simhash) ≤ 3,
    via chunk banding (no quadratic comparison)."""
    sh = df.select(F.col(id_col).cast("long").alias("__id"), simhash_udf(F.col(text_col)).alias("__sh"))
    chunks = sh.select(
        "__id",
        "__sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_id"),
                        F.shiftright("__sh", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("chunk_val"),
                    )
                    for i in range(_CHUNKS)
                ]
            )
        ).alias("c"),
    ).select("__id", "__sh", "c.chunk_id", "c.chunk_val")

    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            on=[
                F.col("a.chunk_id") == F.col("b.chunk_id"),
                F.col("a.chunk_val") == F.col("b.chunk_val"),
                F.col("a.__id") < F.col("b.__id"),
            ],
        )
        .select(F.col("a.__id").alias(id_col), F.col("b.__id").alias("id2"),
                F.col("a.__sh").alias("__sa"), F.col("b.__sh").alias("__sb"))
        .dropDuplicates([id_col, "id2"])
    )
    hamming = F.bit_count(F.col("__sa").bitwiseXOR(F.col("__sb")))
    return cand.filter(hamming <= 3).select(id_col, "id2")
