"""The streaming/parallel fixture-generation path (gen._stream_corpus,
used automatically above 1M files where the in-memory builder exceeds
host RAM) must produce byte-identical ROW CONTENT to the single-shot
path — same rows, same order, same golden oracle — or GEN_VERSION would
have to bump and every committed scaling corpus would be invalidated.

Forced on at 'tiny' scale with a chunk small enough to exercise multiple
pool spans and a ragged final chunk.
"""

import json

import pandas as pd
import pytest

from kgx.fixtures import gen


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    mem_dir = tmp_path_factory.mktemp("gen_mem")
    str_dir = tmp_path_factory.mktemp("gen_stream")
    meta_mem = gen.generate("tiny", mem_dir, stream=False)
    meta_str = gen.generate("tiny", str_dir, stream=True, chunk_files=64)
    return mem_dir, str_dir, meta_mem, meta_str


def test_all_tables_identical(pair):
    mem_dir, str_dir, _, _ = pair
    for t in gen._TABLES:
        a = pd.read_parquet(mem_dir / f"{t}.parquet")
        b = pd.read_parquet(str_dir / f"{t}.parquet")
        pd.testing.assert_frame_equal(a, b, check_dtype=True), t


def test_manifest_meta_identical(pair):
    _, _, meta_mem, meta_str = pair
    assert meta_mem == meta_str
    # the golden-oracle fingerprint is the load-bearing field: identical
    # triples CSV bytes => identical sha
    assert meta_mem["golden_triples_sha256"] == meta_str["golden_triples_sha256"]


def test_stream_chunking_actually_ran(pair):
    """Guard the guard: tiny=200 files at chunk 64 must have produced >1
    span, or this file tests nothing."""
    n_files = gen.SCALES["tiny"][0]
    assert n_files > 64


def test_csv_sha_chunked_equals_single_shot():
    pdf = pd.DataFrame({"a": range(10), "b": [f"s{i}" for i in range(10)]})
    import hashlib

    whole = hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()
    assert gen._csv_sha256(pdf, chunk=3) == whole
    empty = pdf.iloc[0:0]
    whole_empty = hashlib.sha256(empty.to_csv(index=False).encode()).hexdigest()
    assert gen._csv_sha256(empty) == whole_empty


def test_manifest_json_written(pair):
    _, str_dir, _, meta_str = pair
    stamped = json.loads((str_dir / "manifest.json").read_text())
    assert stamped["gen_version"] == gen.GEN_VERSION
    assert stamped["rows"] == meta_str["rows"]
