"""Stage 2 — entity linking (SURVEY §2 K2; BASELINE.json:L6 stage (2)).

Methods, in score order (all against the broadcast lexicon — the dictionary
side of every join here is explicitly broadcast per the spec):

1. ``exact``      (1.00) — normalized surface = canonical name or formula.
2. ``systematic`` (0.95) — OPSIN-style resolution: separator-free skeleton
   lookup for systematic-looking surfaces that miss exact match
   [PK: molminer/OPSIN.py analogue; no subprocess — a broadcast join].
3. ``synonym``    (0.90) — normalized surface = lexicon synonym (misspelling
   / spacing variants recorded in the lexicon).
4. ``abbrev``     (0.85) — doc-local ``defined_as`` long form (bound at
   detection) resolved against the lexicon.
5. ``fuzzy``      (<0.80) — minhash-banded candidate generation + exact
   rerank in pandas UDF batches (kgx.link.minhash / kgx.link.rerank).

The cascade is expressed as *broadcast left joins + null filters* rather
than anti-joins: no shuffle is needed to route a mention to the next method.
The LINKS table is the plain union of the method branches: the branches are
DISJOINT per mention by construction (exact/synonym consume lexicon hits;
systematic consumes exact-misses; fuzzy consumes skeleton-misses; abbrev
consumes the ABBREVIATION mtype no other branch touches) and each branch
emits at most one row per mention (the term/skeleton indexes are unique per
key; the fuzzy surface→compound map is reduced to top-1 per surface with a
VOCABULARY-sized window before it ever meets mention rows).  Round 1–4 ran
a corpus-scale top-1 window over the union instead — a full shuffle of
every link row that the disjointness argument makes redundant (measured
~20% of pipeline core-seconds at the gate corpus).  A mention with no
surviving method yields no link row (the reference drops unresolved
entities the same way [PK: molminer/Extractor.py]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgx.io.dictionary import skeleton_index_df, term_table
from kgx.link.minhash import with_bands  # noqa: F401 (extras reuse)
from kgx.link.rerank import rerank
from kgx.text.normalize import skeleton_col

_BASE_COLS = ["mention_id", "file_key", "repo", "path", "commit", "norm_text", "mtype", "defined_as"]
_LINK_COLS = ["mention_id", "file_key", "repo", "path", "commit", "compound_id", "score", "method"]


def _unique_terms(terms: DataFrame) -> DataFrame:
    """Defensive: one compound per normalized surface (deterministic min)."""
    w = Window.partitionBy("term_norm").orderBy("compound_id", "kind")
    return (
        terms.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def link_entities(
    mentions: DataFrame,
    dict_df: DataFrame,
    enable_fuzzy: bool = True,
    fuzzy_broadcast_max_rows: int = 2_000_000,
) -> DataFrame:
    # terms is consumed by ~6 broadcast builds below; collapse it to one
    # cached partition so each build is a single-task collect instead of a
    # full window-shuffle job (the lexicon is broadcast-sized by design)
    sc = mentions.sparkSession.sparkContext
    sc.setJobDescription("kgx stage2: lexicon term table")
    terms = _unique_terms(term_table(dict_df)).coalesce(1).localCheckpoint()
    base = mentions.select(*_BASE_COLS)

    # --- exact / synonym (one broadcast join serves both) ------------------
    # j and s below fan out into several consumers (exact links, the next
    # method's input, the final top-1 union): localCheckpoint each once so
    # the cascade reads memory instead of re-executing the joins per branch
    # (removing this was tried and measured 1.8× WORSE at local[8] on the
    # 2.4M-file corpus — re-reading the mentions checkpoint per consumer
    # costs more than the cached rows' GC pressure).
    #
    # ALL mention rows flow through this one join (ABBREVIATION rows too —
    # they are routed to their branch by the mtype filters below, never by a
    # second read of `mentions`): this makes j the SINGLE consumer of the
    # detection output, so when the caller passes a lazy `mentions` (the
    # no-run_dir pipeline path), scan→window→detect→join→checkpoint fuse
    # into one job and the corpus is materialized exactly once instead of
    # twice (kgx/pipeline.py round-5 note).
    sc.setJobDescription("kgx stage2: exact/synonym broadcast join")
    j = base.join(
        F.broadcast(terms.select("term_norm", "compound_id", "kind")),
        base.norm_text == F.col("term_norm"),
        "left",
    ).localCheckpoint()
    not_abbrev = F.col("mtype") != "ABBREVIATION"
    exact_links = j.filter(not_abbrev & F.col("compound_id").isNotNull()).select(
        "mention_id",
        "file_key",
        "repo",
        "path",
        "commit",
        "compound_id",
        F.when(F.col("kind") == "synonym", F.lit(0.90)).otherwise(F.lit(1.0)).alias("score"),
        F.when(F.col("kind") == "synonym", F.lit("synonym")).otherwise(F.lit("exact")).alias("method"),
    )
    unmatched = j.filter(not_abbrev & F.col("compound_id").isNull()).select(*_BASE_COLS)

    # --- abbrev: doc-local long form bound at detection --------------------
    # same defined_as-only routing as ever (only ABBREVIATION mentions carry
    # defined_as); reads j's checkpointed rows, not `mentions`
    abbrev_links = (
        j.select(*_BASE_COLS)
        .filter(F.col("defined_as").isNotNull())
        .join(
            F.broadcast(terms.select(F.col("term_norm").alias("__t"), "compound_id")),
            F.col("defined_as") == F.col("__t"),
            "inner",
        )
        .select(
            "mention_id",
            "file_key",
            "repo",
            "path",
            "commit",
            "compound_id",
            F.lit(0.85).alias("score"),
            F.lit("abbrev").alias("method"),
        )
    )

    # --- systematic: skeleton lookup (OPSIN analogue) ----------------------
    skel_idx = skeleton_index_df(terms)
    s = (
        unmatched.filter(F.col("mtype") == "SYSTEMATIC")
        .withColumn("__skel", skeleton_col(F.col("norm_text")))
        .join(F.broadcast(skel_idx), F.col("__skel") == F.col("term_skeleton"), "left")
    )  # two consumers, both cheap re-joins from the checkpointed j
    systematic_links = s.filter(F.col("compound_id").isNotNull()).select(
        "mention_id",
        "file_key",
        "repo",
        "path",
        "commit",
        "compound_id",
        F.lit(0.95).alias("score"),
        F.lit("systematic").alias("method"),
    )

    links = exact_links.unionByName(abbrev_links).unionByName(systematic_links)

    # --- fuzzy: unified signature join -> pandas rerank ---------------------
    # One candidate channel, two signature families concatenated per string:
    # (a) minhash LSH bands (r=4 — moderate-Jaccard pairs, e.g. edit
    #     distance 2 on long names) and
    # (b) deletion-neighborhood signatures (kgx.link.symdel — deterministic
    #     for edit distance ≤1 including short names).
    # Both families are pure JVM column algebra (kgx.link.minhash.bands_col,
    # symdel.del1_signatures): ONE explode, ONE broadcast equi-join on the
    # signature value, with cheap codegen'd gates (length window + built-in
    # levenshtein) so only true near-misses reach the Arrow-batched rerank —
    # candidate volume tracks real misspellings, not band collisions
    # (measured 66M→~30k at bench scale).
    #
    # Everything runs over DISTINCT surfaces, never mention rows: a zipf
    # corpus repeats each hot misspelling tens of thousands of times, so
    # signatures, the candidate join, and the Python scoring are all
    # vocabulary-sized; mention rows only see one final broadcast join of
    # the accepted (surface -> compound, score) map.
    if enable_fuzzy:
        from kgx.link.minhash import minhash_bands_udf
        from kgx.link.rerank import MAX_LEV
        from kgx.link.symdel import del1_signatures

        def with_sigs(df, text_col):
            return (
                df.withColumn(
                    "__sigs",
                    F.concat(
                        del1_signatures(F.col(text_col)),  # JVM
                        minhash_bands_udf(F.col(text_col)),  # Arrow, batch-vectorized
                    ),
                )
                .select("*", F.explode("__sigs").alias("sig"))
                .drop("__sigs")
            )

        fuzzy_mentions = s.filter(F.col("compound_id").isNull()).select(*_BASE_COLS)
        # names only: formulas and CAS numbers must never fuzzy-match (one
        # digit of edit distance changes the identity)
        fuzzy_terms = terms.filter(~F.col("kind").isin("formula", "identifier")).select(
            "term_norm", "compound_id"
        )
        surfaces = fuzzy_mentions.select("norm_text").distinct()  # skinny shuffle
        ms = with_sigs(surfaces, "norm_text")
        ts = with_sigs(fuzzy_terms, "term_norm")
        pair_cands = (
            ms.join(
                F.broadcast(ts),
                on=[
                    ms.sig == ts.sig,
                    F.abs(F.length(ms.norm_text) - F.length(ts.term_norm)) <= MAX_LEV,
                    F.levenshtein(ms.norm_text, ts.term_norm) <= MAX_LEV,
                ],
            )
            .select("norm_text", "compound_id", "term_norm")
            .dropDuplicates(["norm_text", "compound_id", "term_norm"])
        )
        # accepted pairs are bounded by the distinct-misspelling vocabulary
        # (≪ mentions), so the map side broadcasts at any realistic corpus
        # scale — but that is an ASSUMPTION about the corpus, not a law, so
        # measure it (the checkpoint makes the count a cache read) and fall
        # back to a shuffle hash join on an adversarial corpus whose
        # distinct-surface vocabulary outgrows the broadcast budget
        sc.setJobDescription("kgx stage2: fuzzy signatures + rerank")
        # top-1 per SURFACE here, on the vocabulary-sized accepted map —
        # this is what lets the final links table skip a corpus-scale
        # top-1 window: after it, the fuzzy branch (like every other
        # branch) emits at most one row per mention, with the same
        # (score desc, compound_id asc) tiebreak the old global window
        # applied to fuzzy ties
        w_surface = Window.partitionBy("norm_text").orderBy(
            F.col("score").desc(), F.col("compound_id").asc()
        )
        scored = (
            rerank(pair_cands)
            .withColumn("__rn", F.row_number().over(w_surface))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
            .localCheckpoint()
        )
        if scored.count() <= fuzzy_broadcast_max_rows:
            scored = F.broadcast(scored)
        fuzzy_links = fuzzy_mentions.join(scored, "norm_text").select(
            "mention_id", "file_key", "repo", "path", "commit",
            "compound_id", "score", "method",
        )
        links = links.unionByName(fuzzy_links)

    # --- one row per mention, NO corpus-scale shuffle -----------------------
    # The union IS the top-1 result: branches are disjoint per mention
    # (routing by null-filters above) and each emits ≤1 row per mention
    # (unique term/skeleton/abbrev indexes; per-surface top-1 on the fuzzy
    # map).  The former global window (partitionBy mention_id) shuffled
    # every link row — 23M rows / ~700 core-s at the scaling3 corpus — to
    # deterministically break ties that cannot exist across disjoint
    # branches.  Downstream consumers shuffle on their own keys anyway
    # (stage-4 dedup, metrics), so no partitioning contract is lost.
    return links.select(*_LINK_COLS)
