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
