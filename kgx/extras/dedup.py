"""Deduplication operators for large text corpora.

* :func:`exact_dedup`    — hash-groupBy on sha256(text): one shuffle on the
  digest (never on the text itself), deterministic representative.
* :func:`minhash_dedup`  — shingle → minhash → banded LSH → per-bucket
  STAR edges (member → bucket-min id, O(m) per bucket — never the O(m²)
  all-pairs join, which goes quadratic on duplicate-heavy corpora like
  license headers / vendored files) → exact-Jaccard verify → connected
  components → cluster ids.  Byte-identical docs are collapsed by an
  exact-dedup pre-pass FIRST, so the minhash stage only ever sees unique
  texts.  Reuses the entity-linking LSH (kgx.link.minhash) and the
  canonicalization CC kernel (kgx.canon.cc), so its scale posture
  (broadcast-hot/shuffle-cold joins, per-round localCheckpoint) is
  inherited, not re-invented.
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

    Plan shape, built for duplicate-heavy corpora:

    1. EXACT pre-pass — collapse byte-identical docs on sha256(text); only
       one representative per unique text enters the LSH.  A cluster of m
       identical license headers contributes ONE row downstream, not m.
    2. Bands explode (Arrow UDF) carrying only (id, band keys) — the text
       is never replicated 16× through the shuffle.
    3. STAR edges per (band_id, band_hash) bucket: each member links to the
       bucket-min id via a window — O(m) edges per bucket where an
       all-pairs self-join emits O(m²) pairs.  Two near-dups sharing a
       bucket usually both verify against the bucket root and CC merges
       them; a pair similar to each other but not to their bucket root can
       still connect through any of the other BANDS-1 bands (where one of
       them IS the root), trading a small recall tail for non-quadratic
       edge volume.
    4. Exact-Jaccard verify on member↔root pairs only (texts fetched by two
       post-dedup id joins, Arrow-batched UDF).
    5. CC over exact edges ∪ verified star edges.
    """
    ids = df.select(F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text"))

    # 1. exact pre-pass: shuffle the digest, never the text
    wd = Window.partitionBy("__digest")
    digests = (
        ids.withColumn("__digest", F.sha2(F.col("__text"), 256))
        .withColumn("__rep", F.min("__id").over(wd))
    )
    exact_edges = (
        digests.filter(F.col("__id") != F.col("__rep"))
        .select(F.col("__id").alias("src"), F.col("__rep").alias("dst"))
    )
    reps = digests.filter(F.col("__id") == F.col("__rep")).select("__id", "__text")

    # 2. bands over unique texts only; drop the text before the explode
    bands = reps.withColumn("__bands", minhash_bands_udf(F.col("__text"))).select(
        "__id", F.posexplode("__bands").alias("band_id", "band_hash")
    )

    # 3. star edges: min id per bucket, one edge per non-root member
    wb = Window.partitionBy("band_id", "band_hash")
    star = (
        bands.withColumn("__root", F.min("__id").over(wb))
        .filter(F.col("__id") != F.col("__root"))
        .select(F.col("__id").alias("src"), F.col("__root").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )

    # 4. verify member↔root Jaccard; fetch texts AFTER the pair dedup so
    # each distinct edge pulls each side's text exactly once
    txt = reps.select(F.col("__id").alias("__tid"), F.col("__text"))
    pairs = (
        star.join(txt.withColumnRenamed("__text", "__ta"), star.src == txt.__tid)
        .drop("__tid")
        .join(txt.withColumnRenamed("__text", "__tb"), star.dst == F.col("__tid"))
        .drop("__tid")
    )

    @F.pandas_udf(T.DoubleType())
    def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
        return pd.Series([fuzzy_jaccard(x or "", y or "") for x, y in zip(ta, tb)])

    verified = (
        pairs.withColumn("__j", _jac("__ta", "__tb"))
        .filter(F.col("__j") >= jaccard_threshold)
        .select("src", "dst")
    )

    comps = connected_components(exact_edges.unionByName(verified))
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


def batch_simhash(texts: list[str]) -> np.ndarray:
    """Vectorized 64-bit simhash over whitespace-token crc32 hashes.

    One numpy bit-matrix pass per Arrow batch: token hashes are unpacked to
    a (n_tokens, 64) ±1 matrix and summed per row with ``np.add.reduceat``
    — no per-row Python loop, no 64-iteration inner loop per token.
    Returns signed int64 (two's complement of the unsigned simhash).
    """
    import zlib

    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    tok_rows = [(s or "").lower().split() for s in texts]
    lengths = np.fromiter((len(t) for t in tok_rows), dtype=np.int64, count=n)
    # 64-bit token hash = crc32(tok) << 32 | crc32(reversed tok); crc32 is
    # C-speed — the old cost was the per-token 64-bit Python loop, not this
    hashes = np.fromiter(
        (
            (zlib.crc32(tok.encode("utf-8")) << 32) | zlib.crc32(tok[::-1].encode("utf-8"))
            for toks in tok_rows
            for tok in toks
        ),
        dtype=np.uint64,
    )
    if hashes.size == 0:
        return np.zeros(n, dtype=np.int64)
    # (n_tokens, 64) of ±1, then segment-sum by row
    bits = ((hashes[:, None] >> np.arange(_SIM_BITS, dtype=np.uint64)) & np.uint64(1)).astype(
        np.int64
    )
    contrib = 2 * bits - 1
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    # zero-pad one row so offsets == n_tokens (trailing empty rows) stays a
    # valid reduceat index without shifting any real segment boundary; an
    # empty row mid-batch yields reduceat's degenerate a[i] value, masked
    # to zero right after
    padded = np.vstack([contrib, np.zeros((1, _SIM_BITS), dtype=np.int64)])
    acc = np.add.reduceat(padded, offsets, axis=0)
    acc[lengths == 0] = 0
    out = ((acc > 0).astype(np.uint64) << np.arange(_SIM_BITS, dtype=np.uint64)).sum(
        axis=1, dtype=np.uint64
    )
    return out.astype(np.int64)  # two's-complement view == old signed conversion


@F.pandas_udf(T.LongType())
def simhash_udf(texts: pd.Series) -> pd.Series:
    """64-bit simhash (deterministic, batch-vectorized — see batch_simhash)."""
    return pd.Series(batch_simhash(texts.tolist()))


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
