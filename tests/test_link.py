"""Stage-2 linking methods on hand-built mentions (SURVEY §5.2.2)."""

import pytest
from pyspark.sql import functions as F

from kgx.stages.link import link_entities

DICT_ROWS = [
    # (compound_id, canonical_name, name_type, synonyms, formula, smiles, inchi, inchikey, abbrev, priority)
    (0, "water", "TRIVIAL", [], "H2O1X", "O", "InChI=1S/W", "K0", None, 1),
    (1, "ethanol", "TRIVIAL", ["ethanoll"], "C2H6O1", "CCO", "InChI=1S/E", "K1", None, 1),
    (2, "2,3-dimethylbutan-1-ol", "SYSTEMATIC", [], "C6H14O1", "CC(C)C(C)CO", "InChI=1S/D", "K2", "DMB", 0),
]
DICT_SCHEMA = (
    "compound_id long, canonical_name string, name_type string, synonyms array<string>, "
    "formula string, smiles string, inchi string, inchikey string, abbrev string, priority int"
)

MENTION_SCHEMA = (
    "file_key string, repo string, path string, commit string, lang string, mention_id long, "
    "start int, end int, text string, norm_text string, mtype string, defined_as string"
)


def _mention(mid, norm, mtype, defined_as=None):
    return ("fk", "r", "p", "c", "python", mid, 0, 1, norm, norm, mtype, defined_as)


@pytest.fixture(scope="module")
def dict_df(spark):
    return spark.createDataFrame(DICT_ROWS, DICT_SCHEMA)


def _link(spark, dict_df, mentions):
    df = spark.createDataFrame(mentions, MENTION_SCHEMA)
    rows = link_entities(df, dict_df).collect()
    return {r["mention_id"]: (r["compound_id"], r["method"]) for r in rows}


def test_exact_and_formula(spark, dict_df):
    got = _link(spark, dict_df, [
        _mention(1, "water", "TRIVIAL"),
        _mention(2, "c2h6o1", "FORMULA"),
    ])
    assert got == {1: (0, "exact"), 2: (1, "exact")}


def test_synonym(spark, dict_df):
    got = _link(spark, dict_df, [_mention(1, "ethanoll", "TRIVIAL")])
    assert got == {1: (1, "synonym")}


def test_systematic_skeleton(spark, dict_df):
    # dehyphenated variant: exact fails, skeleton matches
    got = _link(spark, dict_df, [_mention(1, "2,3-dimethylbutan-1ol", "SYSTEMATIC")])
    assert got == {1: (2, "systematic")}


def test_abbrev_defined_as(spark, dict_df):
    got = _link(spark, dict_df, [_mention(1, "dmb", "ABBREVIATION", "2,3-dimethylbutan-1-ol")])
    assert got == {1: (2, "abbrev")}


def test_fuzzy_minhash_rerank(spark, dict_df):
    # edit-distance-1 corruptions (insertion / deletion — the lexicon's
    # misspelling envelope), not in lexicon, skeleton mismatch
    got = _link(spark, dict_df, [
        _mention(1, "ethanoil", "SYSTEMATIC"),
        _mention(2, "ethnol", "SYSTEMATIC"),
    ])
    assert got == {1: (1, "fuzzy"), 2: (1, "fuzzy")}


def test_unlinkable_mention_yields_no_row(spark, dict_df):
    got = _link(spark, dict_df, [_mention(1, "completely unrelated words", "SYSTEMATIC")])
    assert got == {}


def test_scores_are_ordered_by_method(spark, dict_df):
    df = spark.createDataFrame(
        [
            _mention(1, "water", "TRIVIAL"),
            _mention(2, "ethanoll", "TRIVIAL"),
            _mention(3, "ethnol", "SYSTEMATIC"),
        ],
        MENTION_SCHEMA,
    )
    rows = {r["mention_id"]: r for r in link_entities(df, dict_df).collect()}
    assert rows[1]["score"] > rows[2]["score"] > rows[3]["score"]


def test_fuzzy_multi_compound_surface_single_link(spark):
    """A surface within the fuzzy envelope of terms of TWO compounds must
    still yield exactly one deterministic link (the per-surface top-1 on
    the accepted map — the invariant that lets the links table skip a
    corpus-scale top-1 window; round-5 rework)."""
    rows = [
        (5, "hexanol", "SYSTEMATIC", [], None, "S5", "I5", "K5", None, 1),
        (6, "hexanal", "SYSTEMATIC", [], None, "S6", "I6", "K6", None, 1),
    ]
    ddf = spark.createDataFrame(rows, DICT_SCHEMA)
    # lev("hexanoll","hexanol")=1 and lev("hexanoll","hexanal")=2: both pass
    # the candidate gates, so the accepted map holds two compounds for the
    # surface before the per-surface top-1
    mentions = spark.createDataFrame(
        [_mention(1, "hexanoll", "SYSTEMATIC"), _mention(2, "hexanoll", "SYSTEMATIC")],
        MENTION_SCHEMA,
    )
    out = link_entities(mentions, ddf).collect()
    assert len(out) == 2  # one row per mention, no duplicates from the map
    assert {r["mention_id"] for r in out} == {1, 2}
    picks = {(r["compound_id"], r["method"], r["score"]) for r in out}
    assert len(picks) == 1  # both mentions of the surface agree
    cpd, method, _ = next(iter(picks))
    assert method == "fuzzy" and cpd == 5  # closer term (lev 1) outscores lev 2
    # deterministic across re-invocations
    again = {(r["mention_id"], r["compound_id"]) for r in link_entities(mentions, ddf).collect()}
    assert again == {(r["mention_id"], r["compound_id"]) for r in out}


def test_fuzzy_broadcast_fallback_same_result(spark, dict_df):
    """fuzzy_broadcast_max_rows=0 forces the shuffle-join fallback for the
    accepted (surface -> compound) map; links must be identical to the
    broadcast path (the guard changes the physical join only)."""
    mentions = [
        _mention(1, "ethanoll", "TRIVIAL"),      # synonym (exact channel)
        _mention(2, "ethnol", "SYSTEMATIC"),     # fuzzy: deletion
        _mention(3, "ethanoil", "SYSTEMATIC"),   # fuzzy: insertion
        _mention(4, "zzqq", "SYSTEMATIC"),       # unlinkable
    ]
    df = spark.createDataFrame(mentions, MENTION_SCHEMA)
    broadcast_path = {
        r["mention_id"]: (r["compound_id"], r["method"], r["score"])
        for r in link_entities(df, dict_df).collect()
    }
    shuffle_path = {
        r["mention_id"]: (r["compound_id"], r["method"], r["score"])
        for r in link_entities(df, dict_df, fuzzy_broadcast_max_rows=0).collect()
    }
    assert broadcast_path == shuffle_path
    assert broadcast_path[2][1] == "fuzzy" and broadcast_path[3][1] == "fuzzy"


def test_rerank_one_row_per_surface_compound(spark):
    """Global output contract: one row per (norm_text, compound_id) even
    when several terms of one compound match a surface from different
    pair-hash buckets (round-2 advisory)."""
    from kgx.link.rerank import rerank

    # two terms of compound 7 both within lev<=2 of the same surface; tiny
    # n_buckets can't co-locate every (surface, term) pair by construction
    pairs = spark.createDataFrame(
        [
            ("ethanoll", "ethanol", 7),
            ("ethanoll", "ethanole", 7),
            ("ethanoll", "methanol", 9),
        ],
        "norm_text string, term_norm string, compound_id long",
    )
    out = rerank(pairs, n_buckets=16).collect()
    keys = [(r["norm_text"], r["compound_id"]) for r in out]
    assert len(keys) == len(set(keys))
    by_key = {(r["norm_text"], r["compound_id"]): r for r in out}
    assert ("ethanoll", 7) in by_key
    # the kept score is the max over that compound's matching terms
    from kgx.link.rerank import _pair_score

    best = max(_pair_score("ethanoll", t)[1] for t in ("ethanol", "ethanole"))
    assert abs(by_key[("ethanoll", 7)]["score"] - best) < 1e-9
