"""Guard against fixture-generator rot (round-1 postmortem).

Round 1 shipped with a refactor that silently dropped the ``smiles`` field
from :func:`kgx.fixtures.gen.build_dictionary` rows.  Because generated
fixtures are gitignored and ``ensure()`` is generate-if-missing, a stale
pre-regression copy on the builder's disk masked the bug locally while every
clean checkout was broken (all 7 ``kg_*`` driver queries + 21 tests red).

This test makes that class of rot impossible to hide: it generates the
``tiny`` fixture into a fresh temp dir every run (never reusing a cached
copy) and asserts the written files match the declared contracts.
"""

import pyarrow.parquet as pq
import pytest

from kgx.fixtures.gen import generate
from kgx.schemas import PREDICATES

# The contract: the compound_dict parquet must carry exactly these columns,
# in this order, with these arrow types (mirrors the pa.schema literal in
# kgx/fixtures/gen.py::generate).
DICT_COLUMNS = [
    ("compound_id", "int64"),
    ("canonical_name", "string"),
    ("name_type", "string"),
    ("synonyms", "list<element: string>"),
    ("formula", "string"),
    ("cas", "string"),
    ("smiles", "string"),
    ("inchi", "string"),
    ("inchikey", "string"),
    ("abbrev", "string"),
    ("priority", "int32"),
]


@pytest.fixture(scope="module")
def fresh_tiny(tmp_path_factory):
    out = tmp_path_factory.mktemp("fixture_guard")
    counts = generate("tiny", out)
    return out, counts


def test_dict_schema_matches_contract(fresh_tiny):
    out, _ = fresh_tiny
    schema = pq.read_schema(out / "compound_dict.parquet")
    got = [(f.name, str(f.type)) for f in schema]
    assert got == DICT_COLUMNS, (
        "compound_dict schema drifted — a generator field was added/dropped/"
        f"retyped.\n  expected: {DICT_COLUMNS}\n  got:      {got}"
    )


def test_no_all_null_dict_columns(fresh_tiny):
    # A field present in the schema but never populated (e.g. dropped from
    # the row dict while the pa.schema still declares it) would arrive as
    # all-null.  cas is legitimately sparse but never empty.
    out, _ = fresh_tiny
    tbl = pq.read_table(out / "compound_dict.parquet")
    for name in ("compound_id", "canonical_name", "smiles", "inchi", "inchikey"):
        assert tbl.column(name).null_count == 0, f"{name} has nulls"
    assert tbl.column("cas").null_count < tbl.num_rows, "cas is all-null"


def test_golden_triples_cover_all_predicates(fresh_tiny):
    out, _ = fresh_tiny
    tbl = pq.read_table(out / "golden_triples.parquet", columns=["pred"])
    preds = set(tbl.column("pred").to_pylist())
    assert preds == set(PREDICATES), (
        f"golden triples missing predicates: {set(PREDICATES) - preds}"
    )


def test_golden_links_cover_all_methods(fresh_tiny):
    # the link-method oracle (driver query kg_links_by_method) is only a
    # real check if every cascade method occurs in the fixture
    out, _ = fresh_tiny
    tbl = pq.read_table(out / "golden_links.parquet", columns=["method"])
    methods = set(tbl.column("method").to_pylist())
    assert methods == {"exact", "synonym", "systematic", "abbrev", "fuzzy"}, methods


def test_generation_is_deterministic(fresh_tiny, tmp_path):
    # Same seed, same scale → byte-identical golden sha (the resume protocol
    # and the driver's value-hash oracle both depend on this).
    _, counts = fresh_tiny
    counts2 = generate("tiny", tmp_path)
    assert counts2["golden_triples_sha256"] == counts["golden_triples_sha256"]
    assert counts2["rows"] == counts["rows"]
