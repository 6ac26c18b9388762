"""Skew-defeating join strategies (SURVEY §2 D3, §4; BASELINE.json:L6
"iterative DataFrame self-joins with salted keys to defeat skew from hot
compounds like 'water'/'ethanol'", "AQE skew-join handling").

Two complementary strategies over a many-rows-per-key "big" side joining a
unique-key "small-per-key" side (the shape of every skewed join in this
pipeline — edges⋈labels in connected components, mentions⋈dict buckets):

* :func:`salted_join` — the explicit-salt pattern the spec names: replicate
  the unique side ×S (one row per salt), route each big-side row to a salt
  derived from a varying column, equi-join on (key, salt).  Splits a hot
  key's rows across S reducers at the cost of S× the small side.

* :func:`hot_cold_join` — targeted variant that only pays replication for
  measured heavy hitters: one cheap map-side-combined count finds keys above
  a threshold; hot rows join against a *broadcast* of their (tiny) matching
  unique rows, cold rows take the normal shuffle join; union the halves.
  At 10^12-file scale this is the default (the hot set — water/ethanol
  analogues — is tiny while total label cardinality is not), with AQE
  skew-join as the runtime backstop for anything the threshold misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join big⋈small on ``key`` with an explicit salt.

    ``small`` must be unique per key (replicated ×n_salts via a generated
    salt column); ``salt_source`` is any big-side expression that varies
    within a key (e.g. the other join endpoint) so a hot key's rows spread
    deterministically across salts — no rand(), so resume/replay stay exact.
    """
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn("__salt", F.pmod(F.xxhash64(salt_source), F.lit(n_salts)))
    out = salted_big.join(salted_small, on=[key, "__salt"], how=how)
    return out.drop("__salt")


def hot_keys_of(big: DataFrame, key: str, hot_threshold: int) -> DataFrame:
    """Measured heavy-hitter keys of ``big`` (map-side-combined count).
    Compute once and pass to :func:`hot_cold_join` when the big side is
    reused across iterations (e.g. the CC loop's loop-invariant edge list)."""
    return (
        big.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_threshold)
        .select(key)
    )


def hot_cold_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_threshold: int = 100_000,
    how: str = "inner",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Split-by-heavy-hitter join: broadcast the unique rows of measured-hot
    keys, shuffle-join the rest.  ``small`` must be unique per ``key``."""
    if hot_keys is None:
        hot_keys = hot_keys_of(big, key, hot_threshold)
    # hot_keys is tiny by construction -> broadcast both the split filters
    # and the hot slice of the unique side
    big_hot = big.join(F.broadcast(hot_keys), key, "left_semi")
    big_cold = big.join(F.broadcast(hot_keys), key, "left_anti")
    small_hot = small.join(F.broadcast(hot_keys), key, "left_semi")
    joined_hot = big_hot.join(F.broadcast(small_hot), key, how)
    joined_cold = big_cold.join(small, key, how)
    return joined_cold.unionByName(joined_hot)
