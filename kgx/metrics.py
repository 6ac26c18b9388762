"""Run metrics & rollups (SURVEY §2 E1/E3/E6/E7).

The reference prints per-run stats from each tool wrapper [PK]; the spec
upgrades this to first-class per-partition metrics (BASELINE.json:L6).
Per-partition row counts + fingerprints live in kgx.io.checkpoint lineage;
this module adds the analyst-facing rollups over the produced graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def triple_counts(triples: DataFrame) -> DataFrame:
    """Counts by predicate (partial+final hash agg — E1)."""
    return triples.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).orderBy("pred")


def triple_rollup(triples: DataFrame) -> DataFrame:
    """pred × subj-namespace rollup with grand total in one pass (E6)."""
    ns = F.split(F.col("subj"), ":").getItem(0).alias("subj_ns")
    return (
        triples.select("pred", ns)
        .rollup("pred", "subj_ns")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("pred").asc_nulls_first(), F.col("subj_ns").asc_nulls_first())
    )


def partition_stats(df: DataFrame) -> DataFrame:
    """Per-partition row counts (E7) — the skew diagnostic: a healthy
    pipeline shows near-uniform rows per partition after the explicit
    file_key repartition."""
    return (
        df.select(F.spark_partition_id().alias("partition_id"))
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy("partition_id")
    )


def graph_summary(triples: DataFrame) -> DataFrame:
    """One-row dashboard: exact + approximate distinct entity counts (E3 —
    HLL++ approx_count_distinct is the 10^12-scale variant)."""
    return triples.agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.countDistinct("subj").alias("n_subjects"),
        F.approx_count_distinct("subj").alias("approx_subjects"),
        F.countDistinct(F.when(F.col("pred") == "mentions", F.col("obj"))).alias(
            "n_mentioned_compounds"
        ),
    )
