"""Exact-score rerank of LSH candidates inside pandas UDF batches
(SURVEY §2 C3; BASELINE.json:L6 "exact-score rerank inside pandas UDF
batches").

Input: (mention, candidate-term) pairs from the minhash-band join.  Groups
are formed by a *pseudo-bucket* — ``pmod(xxhash64(mention_id), n_buckets)``
— not by mention_id (billions of tiny groups) and not by band bucket (a pair
can appear in several bands; dedup happens before grouping).  Every pair of
one mention lands in one group, so per-mention decisions are local to the
group, and bucket count bounds group size for Arrow memory (SURVEY §7
hard-part 5).

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

RERANK_SCHEMA = (
    "mention_id long, file_key string, repo string, path string, commit string, "
    "compound_id long, score double, method string"
)

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


def _rerank_group(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = ["mention_id", "file_key", "repo", "path", "commit", "compound_id", "score", "method"]
    if pdf.empty:
        return pdf.iloc[0:0].assign(score=0.0, method="")[cols]
    # many mentions share a surface form: score each distinct string pair once
    cache: dict[tuple[str, str], tuple[int, float]] = {}
    levs, scores = [], []
    for a, b in zip(pdf["norm_text"], pdf["term_norm"]):
        key = (a, b)
        got = cache.get(key)
        if got is None:
            got = cache[key] = _pair_score(a, b)
        levs.append(got[0])
        scores.append(got[1])
    out = pdf.assign(__lev=levs, score=scores, method="fuzzy")
    out = out[(out["__lev"] <= MAX_LEV) & (out["score"] >= FUZZY_SCALE * MIN_SCORE)]
    return out[cols]


def rerank(candidates: DataFrame, n_buckets: int | None = None) -> DataFrame:
    """candidates: mention_id, file_key, repo, path, commit, norm_text,
    compound_id, term_norm  ->  scored fuzzy link rows.

    n_buckets defaults to 2× the session's shuffle parallelism — enough
    groups to spread work, coarse enough that groups aren't per-mention.
    """
    if n_buckets is None:
        n_buckets = 2 * int(
            candidates.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    bucketed = candidates.withColumn(
        "__bucket", F.pmod(F.xxhash64("mention_id"), F.lit(n_buckets))
    )
    # explicit numbered repartition: AQE's byte-based coalescing would fuse
    # this shuffle down to a handful of partitions (the rows are narrow) and
    # serialize the Python scoring — partition count must reflect CPU cost,
    # not bytes.  groupBy on the same key then reuses this exchange.
    bucketed = bucketed.repartition(n_buckets, "__bucket")
    return bucketed.groupBy("__bucket").applyInPandas(
        lambda pdf: _rerank_group(pdf), RERANK_SCHEMA
    )
