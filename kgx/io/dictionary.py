"""Compound lexicon loading + the broadcast term index (SURVEY §2 A4).

The dictionary is the closed-world fusion of the reference's ChemSpot
dictionaries and OPSIN vocabulary [BASELINE.json:L6 "broadcast dictionary of
canonical compounds (InChI/SMILES keys)"].  Two artifacts come out of it:

* ``term_table(dict_df)``   — one row per lookup surface (canonical name,
  each synonym, the molecular formula), with its normalized form, skeleton
  (separator-free form for OPSIN-style systematic resolution) and mtype.
  This is the small side of every linking join and is always broadcast.
* ``detection_index(...)``  — a plain ``{norm_term: mtype}`` python dict
  shipped to executors via ``sparkContext.broadcast`` for the stage-1
  detection kernel (membership + type only; compound resolution happens in
  the linking joins, keeping detection and linking independently testable).

At 10^12-file scale the term table stays a few hundred MB (millions of
surfaces × short strings) — comfortably broadcastable, which is exactly why
the spec pins this side of the join as a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.io.tableformat import read_table
from kgx.text.normalize import norm_term, skeleton


def load_dict(spark: SparkSession, uri: str, fmt: str = "parquet") -> DataFrame:
    return read_table(spark, uri, fmt=fmt)


def term_table(dict_df: DataFrame) -> DataFrame:
    """Explode the lexicon into one row per lookup surface.

    Columns: term_norm, term_skeleton, compound_id, mtype, kind
    (kind ∈ canonical | synonym | formula — maps to link method).
    Pure JVM expressions; normalization mirrors kgx.text.normalize.
    """
    from kgx.text.normalize import norm_term_col, skeleton_col

    canonical = dict_df.select(
        norm_term_col(F.col("canonical_name")).alias("term_norm"),
        skeleton_col(F.col("canonical_name")).alias("term_skeleton"),
        F.col("canonical_name").alias("term_raw"),
        "compound_id",
        F.col("name_type").alias("mtype"),
        F.lit("canonical").alias("kind"),
    )
    synonyms = (
        dict_df.select("compound_id", "name_type", F.explode("synonyms").alias("syn"))
        .select(
            norm_term_col(F.col("syn")).alias("term_norm"),
            skeleton_col(F.col("syn")).alias("term_skeleton"),
            F.col("syn").alias("term_raw"),
            "compound_id",
            F.col("name_type").alias("mtype"),
            F.lit("synonym").alias("kind"),
        )
    )
    formulas = dict_df.filter(F.col("formula").isNotNull()).select(
        norm_term_col(F.col("formula")).alias("term_norm"),
        skeleton_col(F.col("formula")).alias("term_skeleton"),
        F.col("formula").alias("term_raw"),
        "compound_id",
        F.lit("FORMULA").alias("mtype"),
        F.lit("formula").alias("kind"),
    )
    out = canonical.unionByName(synonyms).unionByName(formulas)
    if "cas" in dict_df.columns:  # older lexicons may predate the column
        cas = dict_df.filter(F.col("cas").isNotNull()).select(
            norm_term_col(F.col("cas")).alias("term_norm"),
            skeleton_col(F.col("cas")).alias("term_skeleton"),
            F.col("cas").alias("term_raw"),
            "compound_id",
            F.lit("IDENTIFIER").alias("mtype"),
            F.lit("identifier").alias("kind"),
        )
        out = out.unionByName(cas)
    return out


def detection_index_from_uri(uri: str) -> dict[str, str]:
    """Build the detection index straight from the dictionary parquet with
    pyarrow — ~10× faster than a Spark toPandas round-trip for a small
    driver-side artifact."""
    import pandas as pd

    return detection_index(pd.read_parquet(uri))


def detection_index(dict_pdf) -> dict[str, str]:
    """Driver-side build of the {norm_term: mtype} membership index from a
    pandas copy of the dictionary (collect happens once; the dictionary is
    the broadcast-sized side by design)."""
    idx: dict[str, str] = {}
    for r in dict_pdf.itertuples(index=False):
        idx[norm_term(r.canonical_name)] = r.name_type
        for s in r.synonyms if r.synonyms is not None else []:
            idx[norm_term(s)] = r.name_type
        if r.formula:
            idx[norm_term(r.formula)] = "FORMULA"
        cas = getattr(r, "cas", None)  # older lexicons may predate the column
        if isinstance(cas, str) and cas:
            idx[norm_term(cas)] = "IDENTIFIER"
    return idx


def skeleton_index_df(terms: DataFrame) -> DataFrame:
    """Distinct skeleton -> compound rows for the OPSIN-style systematic
    resolver (SURVEY §2 C4): a deterministic separator-free-form lookup that
    replaces the reference's OPSIN subprocess [PK: molminer/OPSIN.py]."""
    return (
        terms.filter(F.col("mtype") == "SYSTEMATIC")
        .select("term_skeleton", "compound_id")
        .dropDuplicates(["term_skeleton"])
    )


__all__ = ["load_dict", "term_table", "detection_index", "skeleton_index_df", "norm_term", "skeleton"]
