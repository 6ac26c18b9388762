"""Exact-score rerank of LSH candidates inside pandas UDF batches
(SURVEY §2 C3; BASELINE.json:L6 "exact-score rerank inside pandas UDF
batches").

Input: DISTINCT (surface, term) candidate pairs from the signature join —
NOT mention-level rows.  Scoring cost is per distinct string pair, and the
same corrupted surface recurs across thousands of mentions (hot compounds'
misspellings dominate a zipf corpus), so deduplicating FIRST makes the
Python volume a function of vocabulary, not corpus.  It also fixes a
measured skew: bucketing mention-level pairs by mention hash landed the
distinct-pair-dense (cache-miss) work in a few buckets — 0.8s median vs
11s max per equal-row bucket on the 2.4M-file corpus — while pair-hash
buckets over distinct pairs are uniform by construction (every row costs
one levenshtein + one jaccard, no cache-hit lottery).

Groups are formed by ``pmod(xxhash64(surface, term), n_buckets)``; the
accepted output (surface → compound, score) is broadcast-joined back to
mention rows by the caller (kgx.stages.link), so mentions never shuffle
for fuzzy scoring at all.

Score = 0.4 · exact mixed-shingle Jaccard + 0.6 · (1 − levenshtein/maxlen),
gated by lev ≤ 2 (edit-distance envelope of the lexicon's deliberate
misspellings) and a floor; the lev term dominates because one edit on a
short name legitimately halves its shingle Jaccard.  Surviving pairs keep
score scaled into the fuzzy method's band (< every deterministic method's
score).
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


def _score_group(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = ["norm_text", "compound_id", "score", "method"]
    if pdf.empty:
        return pdf.iloc[0:0].assign(score=0.0, method="")[cols]
    levs, scores = [], []
    for a, b in zip(pdf["norm_text"], pdf["term_norm"]):
        lev, score = _pair_score(a, b)
        levs.append(lev)
        scores.append(score)
    out = pdf.assign(__lev=levs, score=scores, method="fuzzy")
    out = out[(out["__lev"] <= MAX_LEV) & (out["score"] >= FUZZY_SCALE * MIN_SCORE)]
    # one row per (surface, compound): several terms of one compound may
    # match the surface — keep the best score (deterministic max)
    out = out.sort_values(["norm_text", "compound_id", "score"]).drop_duplicates(
        ["norm_text", "compound_id"], keep="last"
    )
    return out[cols]


def rerank(pairs: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """pairs: DISTINCT (norm_text, term_norm, compound_id) candidate rows
    -> accepted (norm_text, compound_id, score, method='fuzzy').

    n_buckets defaults to 2× the session's shuffle parallelism — enough
    groups to spread the Python scoring, coarse enough that groups aren't
    per-pair.
    """
    if n_buckets is None:
        n_buckets = 2 * int(
            pairs.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    bucketed = pairs.withColumn(
        "__bucket", F.pmod(F.xxhash64("norm_text", "term_norm"), F.lit(n_buckets))
    )
    # explicit numbered repartition: AQE's byte-based coalescing would fuse
    # this shuffle down to a handful of partitions (the rows are narrow) and
    # serialize the Python scoring — partition count must reflect CPU cost,
    # not bytes.  groupBy on the same key then reuses this exchange.
    bucketed = bucketed.repartition(n_buckets, "__bucket")
    scored = bucketed.groupBy("__bucket").applyInPandas(
        lambda pdf: _score_group(pdf), PAIR_SCORE_SCHEMA
    )
    # _score_group dedups (surface, compound) only WITHIN its bucket; two
    # terms of one compound matching the same surface can hash to different
    # buckets, so enforce the documented "one row per (surface, compound)"
    # contract globally.  Accepted rows are vocabulary-sized, so this final
    # max-score reduction is a tiny shuffle.
    return (
        scored.groupBy("norm_text", "compound_id")
        .agg(F.max("score").alias("score"))
        .withColumn("method", F.lit("fuzzy"))
    )
