"""Canonical-representative election (SURVEY §2 E5; BASELINE.json:L6
"canonicalization").

Per component, the representative compound is argmin (priority,
compound_id) — a total order, so election is deterministic (SURVEY §7
hard-part 3).  Expressed as the Spark argmin idiom ``min(struct(...))``:
one partial+final hash aggregate, no window, no UDF.

The CC stage runs over compound↔compound shared-structure edges only (see
kgx.pipeline.build_edges), so its output covers exactly the compounds that
belong to a multi-entry component; every other dictionary compound is a
singleton whose component is itself.  ``compound_rep_map`` totalizes over
the full dictionary accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def compound_components(components: DataFrame, dict_df: DataFrame) -> DataFrame:
    """Totalized (compound_id, component_id) over the WHOLE dictionary:
    CC labels where present, self for singleton compounds."""
    labels = components.select(
        F.col("node_id").alias("compound_id"), F.col("component_id").alias("__cc")
    )
    return (
        dict_df.select(F.col("compound_id").cast("long").alias("compound_id"))
        .join(labels, "compound_id", "left")
        .select(
            "compound_id",
            F.coalesce("__cc", F.col("compound_id")).alias("component_id"),
        )
    )


def elect_representatives(cc: DataFrame, dict_df: DataFrame) -> DataFrame:
    """(compound_id, component_id) -> (component_id, rep_id): argmin
    (priority, compound_id) per component."""
    joined = cc.join(
        F.broadcast(dict_df.select(F.col("compound_id").cast("long").alias("compound_id"), "priority")),
        "compound_id",
    )
    return joined.groupBy("component_id").agg(
        F.min(F.struct("priority", "compound_id")).alias("__m")
    ).select("component_id", F.col("__m.compound_id").alias("rep_id"))


def compound_rep_map(components: DataFrame, dict_df: DataFrame) -> DataFrame:
    """-> (compound_id, component_id, rep_id) for every dictionary
    compound; the broadcastable map materialize joins links against.

    Eagerly collapsed to one cached partition: stage 4 broadcasts it from
    several plan shapes, and a single-task collect per broadcast beats
    re-running the election aggregation each time."""
    cc = compound_components(components, dict_df)
    reps = elect_representatives(cc, dict_df)
    return cc.join(reps, "component_id").coalesce(1).localCheckpoint()
