"""Stage 4 — graph materialization into partitioned triple tables
(SURVEY §2 K4; BASELINE.json:L6 stage (4)).

Emits the five predicates over canonicalized entities:

* ``mentions``    doc:<repo>/<path>@<commit>  ->  cpd:<rep>
* ``foundInRepo`` cpd:<rep>                   ->  repo:<repo>
* ``hasSMILES``   cpd:<rep>                   ->  smiles literal
* ``hasInChI``    cpd:<rep>                   ->  inchi literal
* ``synonymOf``   cpd:<member>                ->  cpd:<rep>   (member ≠ rep)

Structure/synonym predicates are emitted only for components with at least
one linked mention (the reference emits extracted entities, not the whole
lexicon [PK: molminer/Extractor.py]).  URI conventions shared with the
paper oracle (kgx/fixtures/oracle.py).

Plan shape: links ⋈ broadcast(compound→rep map) — the map has lexicon
cardinality, broadcastable by the same argument as the dictionary — then
per-predicate dropDuplicates on COMPACT precursor keys ((repo, path,
commit, rep_id) / (rep_id, repo)) with the URI string concat applied only
to the deduped survivors: the distinct shuffle carries small columns
instead of built URI strings (a measured GC hot spot — 66s of the
local[8] run's GC was the string-keyed distinct at the 2.4M-file corpus),
and a downstream count() prunes the concat away entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx.io.tableformat import write_table


def _doc_uri():
    return F.concat(F.lit("doc:"), F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit"))


def materialize_triples(links: DataFrame, rep_map: DataFrame, dict_df: DataFrame) -> DataFrame:
    """links + (compound_id -> rep_id) map + lexicon -> TRIPLES DataFrame."""
    linked = links.join(
        F.broadcast(rep_map.select("compound_id", "component_id", "rep_id")), "compound_id"
    )
    cpd = lambda c: F.concat(F.lit("cpd:"), F.col(c).cast("string"))  # noqa: E731

    # dedup on the compact natural keys, THEN build URI strings: (repo,
    # path, commit) <-> doc uri and rep_id <-> cpd uri are bijective, so
    # the result set is identical while the distinct shuffle never carries
    # a concatenated string
    mentions_t = (
        linked.select("repo", "path", "commit", "rep_id")
        .dropDuplicates(["repo", "path", "commit", "rep_id"])
        .select(_doc_uri().alias("subj"), F.lit("mentions").alias("pred"), cpd("rep_id").alias("obj"))
    )
    found_t = (
        linked.select("rep_id", "repo")
        .dropDuplicates(["rep_id", "repo"])
        .select(cpd("rep_id").alias("subj"), F.lit("foundInRepo").alias("pred"),
                F.concat(F.lit("repo:"), F.col("repo")).alias("obj"))
    )

    mentioned_comps = linked.select("component_id").distinct()
    members = rep_map.join(F.broadcast(mentioned_comps), "component_id")

    reps = members.filter(F.col("compound_id") == F.col("rep_id")).select("rep_id")
    rep_info = reps.join(
        F.broadcast(dict_df.select(F.col("compound_id").alias("rep_id"), "smiles", "inchi")),
        "rep_id",
    )
    smiles_t = rep_info.filter(F.col("smiles").isNotNull()).select(
        cpd("rep_id").alias("subj"), F.lit("hasSMILES").alias("pred"), F.col("smiles").alias("obj")
    )
    inchi_t = rep_info.filter(F.col("inchi").isNotNull()).select(
        cpd("rep_id").alias("subj"), F.lit("hasInChI").alias("pred"), F.col("inchi").alias("obj")
    )
    synonym_t = members.filter(F.col("compound_id") != F.col("rep_id")).select(
        cpd("compound_id").alias("subj"), F.lit("synonymOf").alias("pred"), cpd("rep_id").alias("obj")
    )

    return (
        mentions_t.unionByName(found_t)
        .unionByName(smiles_t)
        .unionByName(inchi_t)
        .unionByName(synonym_t)
    )


def write_triples(triples: DataFrame, uri: str, fmt: str = "parquet") -> None:
    """Partition by pred, cluster by subj inside partitions (compression +
    read locality — SURVEY §2 A2/G4)."""
    out = triples.repartition("pred").sortWithinPartitions("subj", "obj")
    write_table(out, uri, fmt=fmt, partition_by=["pred"])
