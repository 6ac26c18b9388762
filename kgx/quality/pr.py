"""Precision/recall vs golden triples (SURVEY §2 H3; BASELINE.json:L2,L6,L14
"P/R ≥ 0.95 vs golden fixtures").

Inner join (not ``intersect``) so the per-predicate breakdown falls out of
one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["subj", "pred", "obj"]


def precision_recall(predicted: DataFrame, golden: DataFrame) -> dict:
    p = predicted.select(*KEY).distinct()
    g = golden.select(*KEY).distinct()
    tp = p.join(g, KEY, "inner").count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    return {
        "tp": tp,
        "predicted": np_,
        "golden": ng,
        "precision": precision,
        "recall": recall,
        "f1": (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0,
    }


def per_predicate(predicted: DataFrame, golden: DataFrame) -> DataFrame:
    p = predicted.select(*KEY).distinct().withColumn("__p", F.lit(1))
    g = golden.select(*KEY).distinct().withColumn("__g", F.lit(1))
    full = p.join(g, KEY, "full_outer")
    return full.groupBy("pred").agg(
        F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("__p").isNotNull() & F.col("__g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("__p").isNull() & F.col("__g").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
