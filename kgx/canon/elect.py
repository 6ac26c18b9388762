"""Canonical-representative election (SURVEY §2 E5; BASELINE.json:L6
"canonicalization").

Per component, the representative compound is argmin (priority,
compound_id) — a total order, so election is deterministic (SURVEY §7
hard-part 3).  Expressed as the Spark argmin idiom ``min(struct(...))``:
one partial+final hash aggregate, no window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.schemas import MENTION_NODE_OFFSET


def compound_components(components: DataFrame) -> DataFrame:
    """Filter the bipartite CC output to compound nodes -> (compound_id,
    component_id)."""
    return components.filter(F.col("node_id") < MENTION_NODE_OFFSET).select(
        F.col("node_id").alias("compound_id"), "component_id"
    )


def elect_representatives(components: DataFrame, dict_df: DataFrame) -> DataFrame:
    """-> (component_id, rep_id): argmin (priority, compound_id) per component."""
    cc = compound_components(components)
    joined = cc.join(
        F.broadcast(dict_df.select("compound_id", "priority")), "compound_id"
    )
    return joined.groupBy("component_id").agg(
        F.min(F.struct("priority", "compound_id")).alias("__m")
    ).select("component_id", F.col("__m.compound_id").alias("rep_id"))


def compound_rep_map(components: DataFrame, dict_df: DataFrame) -> DataFrame:
    """-> (compound_id, component_id, rep_id) for every compound in the
    graph; the broadcastable map materialize joins links against.

    Eagerly collapsed to one cached partition: stage 4 broadcasts it from
    several plan shapes, and a single-task collect per broadcast beats
    re-running the election aggregation each time."""
    reps = elect_representatives(components, dict_df)
    return (
        compound_components(components)
        .join(reps, "component_id")
        .coalesce(1)
        .localCheckpoint()
    )
