"""General distributed connected components (SURVEY §2 D9; BASELINE.json:L6
stage (3) "canonicalization via connected-components ... iterative DataFrame
self-joins with salted keys").

Label propagation to the minimum node id, as iterative DataFrame joins:

* each round: every node takes min(own label, neighbors' labels); the
  edges⋈labels join goes through :func:`kgx.shuffle.salt.hot_cold_join`
  (a hot node — e.g. the bucket root of a giant near-dup cluster in
  kgx.extras.dedup — has millions of edges but one label row; the
  broadcast-hot/shuffle-cold split defeats that skew, with AQE skew-join
  enabled as the backstop);
* ``localCheckpoint`` after every round truncates the exploding lineage —
  without it the logical plan doubles per iteration (SURVEY §4);
* convergence = zero labels changed (an agg, not exceptAll — SURVEY §2 H2).

Consumers: the KG canonicalization stage (kgx.pipeline — compound↔compound
shared-structure STAR edges, so node ids are exact dictionary compound_ids,
the graph diameter is 1, and the loop converges in one round at lexicon —
not corpus — scale) and corpus near-dup dedup (kgx.extras.dedup — doc-id
nodes over band star edges; here the iterative machinery earns its keep).
``max_iter`` guards pathological inputs; correctness at every sandbox scale
is property-tested against networkx, including hot-star graphs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

from kgx.shuffle.salt import hot_cold_join, hot_keys_of


def connected_components(
    edges: DataFrame,
    max_iter: int = 20,
    hot_threshold: int = 50_000,
    stop=None,
) -> DataFrame:
    """edges(src long, dst long, undirected) -> (node_id, component_id).

    Every node present in ``edges`` gets a row; component_id = min node id
    reachable (for the bipartite KG graph: the min compound id).

    ``stop``: optional zero-arg callable checked between rounds — when it
    returns True the loop raises instead of submitting further Spark jobs
    (cooperative cancellation for callers running this on a background
    thread, e.g. kgx.pipeline's concurrent canonicalization).
    """
    adj = (
        edges.select(F.col("src").alias("node"), F.col("dst").alias("nbr"))
        .unionByName(edges.select(F.col("dst").alias("node"), F.col("src").alias("nbr")))
        .localCheckpoint()  # loop-invariant: read once per round, not rebuilt
    )
    # hotness of the edge list never changes across rounds — measure once
    hot = F.broadcast(hot_keys_of(adj, "nbr", hot_threshold).localCheckpoint())

    labels = (
        adj.groupBy("node")
        .agg(F.min("nbr").alias("__mn"))
        .select("node", F.least("node", "__mn").alias("label"))
        .localCheckpoint()
    )

    from pyspark.sql import Observation

    changed = -1  # sentinel: stays -1 only if max_iter <= 0 (loop never ran)
    for _ in range(max_iter):
        if stop is not None and stop():
            raise RuntimeError("connected_components cancelled by stop flag")
        nbr_labels = hot_cold_join(
            adj,
            labels.select(F.col("node").alias("nbr"), F.col("label").alias("nbr_label")),
            "nbr",
            hot_threshold=hot_threshold,
            hot_keys=hot,
        ).select(
            "node",
            F.col("nbr_label").alias("label"),
            F.lit(None).cast("long").alias("__old"),
        )

        # carry the previous label through the same aggregation so
        # convergence needs no extra join: min(label) is the new label,
        # max(__old) recovers the old one (exactly one non-null per node);
        # the changed-count rides the materialization job via observe() —
        # one Spark job per round, total
        obs = Observation()
        new_labels = (
            nbr_labels.unionByName(
                labels.select("node", "label", F.col("label").alias("__old"))
            )
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("__old").alias("__old"))
            .observe(
                obs,
                F.sum(F.when(F.col("label") < F.col("__old"), 1).otherwise(0)).alias("changed"),
            )
            .localCheckpoint()
        )

        changed = obs.get["changed"] or 0
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    else:
        # Exhausting max_iter with changed > 0 means the labels returned
        # below are NOT fixed-point component ids — surface it instead of
        # silently handing back wrong components on pathological graphs.
        log.warning(
            "connected_components hit max_iter=%d with %d labels still "
            "changing; returned component ids are not converged",
            max_iter,
            changed,
        )

    return labels.select(F.col("node").alias("node_id"), F.col("label").alias("component_id"))
