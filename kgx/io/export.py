"""Reference-compatible flat CSV export (SURVEY §2 A6).

MolMiner's terminal output is a flat CSV of merged extraction rows
[PK: molminer/utils.py dict→CSV writer]; this reproduces that surface from
the linked-mention table: one row per linked mention with its resolved
structure fields, deterministically ordered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXPORT_COLS = [
    "repo",
    "path",
    "commit",
    "start",
    "end",
    "text",
    "mtype",
    "method",
    "score",
    "compound_id",
    "canonical_name",
    "smiles",
    "inchi",
    "inchikey",
]


def extraction_rows(mentions: DataFrame, links: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Merged extraction rows (the reference's CSV schema analogue)."""
    m = mentions.select("mention_id", "repo", "path", "commit", "start", "end", "text", "mtype")
    l = links.select("mention_id", "compound_id", "score", "method")
    d = dict_df.select("compound_id", "canonical_name", "smiles", "inchi", "inchikey")
    return (
        m.join(l, "mention_id")
        .join(F.broadcast(d), "compound_id")
        .select(*EXPORT_COLS)
        .orderBy("repo", "path", "commit", "start")
    )


def export_csv(df: DataFrame, path: str) -> None:
    """Single deterministic CSV file (debug/interchange scale only — the
    coalesce(1) is intentional and documented: partitioned parquet triples
    are the real sink, kgx.stages.materialize)."""
    df.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
