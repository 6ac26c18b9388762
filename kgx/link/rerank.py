"""Exact-score rerank of LSH candidates (SURVEY §2 C3; BASELINE.json:L6
"exact-score rerank inside pandas UDF batches").

Input: DISTINCT (surface, term) candidate pairs from the signature join —
NOT mention-level rows.  Scoring cost is per distinct string pair, and the
same corrupted surface recurs across thousands of mentions (hot compounds'
misspellings dominate a zipf corpus), so deduplicating FIRST makes the
Python volume a function of vocabulary, not corpus.

Score = 0.4 · exact mixed-shingle Jaccard + 0.6 · (1 − levenshtein/maxlen),
gated by lev ≤ 2 (edit-distance envelope of the lexicon's deliberate
misspellings) and a floor; the lev term dominates because one edit on a
short name legitimately halves its shingle Jaccard.  Surviving pairs keep
score scaled into the fuzzy method's band (< every deterministic method's
score).

Round-7 rework (guide §4.1/§2.4): the scorer is a VECTORIZED pandas UDF
*projection* — one ``ArrowEvalPython`` over the vocabulary-sized pair rows
in place of the former ``repartition(2×parallelism) →
groupBy(__bucket).applyInPandas`` path, which paid a full exchange, a
per-bucket pandas sort/dedup, and grouped-map overhead for the same
per-pair Python work.  Scores are computed by the identical
:func:`_pair_score` function, so they are bit-identical by construction.
(A pure-JVM scorer via array higher-order functions was tried first and
rejected: HOF expression trees fall out of whole-stage codegen and run
interpreted — the same failure mode kgx.link.minhash documents for a JVM
minhash — and Catalyst additionally pushed the deterministic score filter
into the signature join's bound condition, evaluating the scorer per raw
band collision.  A Python UDF is opaque to both.)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.link.minhash import fuzzy_jaccard
from kgx.text.normalize import levenshtein

PAIR_SCORE_SCHEMA = "norm_text string, compound_id long, score double, method string"

# Designed recall envelope: insert/delete/duplicate corruptions at edit
# distance ≤ 2 (the lexicon's misspelling model).  Adjacent transpositions on
# very short names can fall to ~0.2 Jaccard where the banding itself has a
# ~20% miss rate — out of envelope by design; widen BANDS before loosening
# the score floor if that ever matters.
FUZZY_SCALE = 0.80  # fuzzy scores live in (0, 0.80)
MAX_LEV = 2  # the precision guard: candidates must be ≤2 edits from a surface
MIN_SCORE = 0.50


def _pair_score(a: str, b: str) -> tuple[int, float]:
    lev = levenshtein(a, b, cap=MAX_LEV + 2)  # banded: exact where it matters
    score = FUZZY_SCALE * (
        0.4 * fuzzy_jaccard(a, b) + 0.6 * (1.0 - lev / max(len(a), len(b), 1))
    )
    return lev, score


from pyspark.sql import types as T

_PS_TYPE = T.StructType(
    [T.StructField("lev", T.IntegerType()), T.StructField("score", T.DoubleType())]
)


@F.pandas_udf(_PS_TYPE)
def _pair_score_udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """Arrow-batched twin of :func:`_pair_score` (same function per pair —
    bit-identical scores)."""
    levs: list[int] = []
    scores: list[float] = []
    for x, y in zip(a, b):
        lev, score = _pair_score(x, y)
        levs.append(lev)
        scores.append(score)
    return pd.DataFrame({"lev": pd.array(levs, dtype="int32"), "score": scores})


# The function is pure, but marking it non-deterministic stops the
# optimizer from duplicating the evaluation (guide §4.4): with the default
# marking, the filter below references the UDF column and Catalyst plans
# TWO ArrowEvalPython nodes — one under the pushed filter, one in the
# surviving projection — so every pair pays the scorer twice (observed in
# plans/r07/rerank_scored_after.txt's first capture).
_pair_score_udf = _pair_score_udf.asNondeterministic()


def rerank(pairs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """pairs: DISTINCT (norm_text, term_norm, compound_id) candidate rows
    -> accepted (norm_text, compound_id, score, method='fuzzy'), one row
    per (surface, compound) keeping the max score over that compound's
    matching terms (several terms of one compound may match one surface).

    One Arrow projection + one vocabulary-sized groupBy — no repartition
    exchange, no grouped-map.  ``n_buckets`` is kept for call compatibility
    with the former applyInPandas implementation and is unused (the scoring
    spreads over whatever partitioning ``pairs`` already has).
    """
    del n_buckets  # no bucketed Python grouping pass to spread anymore
    ps = _pair_score_udf(F.col("norm_text"), F.col("term_norm"))
    return (
        pairs.select("norm_text", "compound_id", ps.alias("__ps"))
        .filter(
            (F.col("__ps.lev") <= MAX_LEV)
            & (F.col("__ps.score") >= FUZZY_SCALE * MIN_SCORE)
        )
        .select("norm_text", "compound_id", F.col("__ps.score").alias("score"))
        .groupBy("norm_text", "compound_id")
        .agg(F.max("score").alias("score"))
        .withColumn("method", F.lit("fuzzy"))
    )
