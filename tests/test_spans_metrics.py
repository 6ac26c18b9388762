"""Span sweep (F3 ≡ D6 oracle, property-tested) + metrics rollups + export."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SPAN_SCHEMA = "file_key string, mention_id long, start int, end int"


def _df(spark, spans):
    rows = [("f", i, s, e) for i, (s, e) in enumerate(spans)]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _run_both(spark, spans):
    from kgx.stages.spans import resolve_overlaps, resolve_overlaps_naive

    df = _df(spark, spans)
    a = sorted((r["start"], r["end"]) for r in resolve_overlaps(df).collect())
    b = sorted((r["start"], r["end"]) for r in resolve_overlaps_naive(df).collect())
    return a, b


def test_leftmost_longest_kept(spark):
    a, b = _run_both(spark, [(0, 5), (0, 10), (3, 8), (12, 20), (15, 18)])
    assert a == b == [(0, 10), (12, 20)]


def test_aggressive_shadowing_chain(spark):
    # B overlaps A and is dropped; C overlaps only B — dropped too (doc'd bias)
    a, b = _run_both(spark, [(0, 5), (3, 20), (6, 8)])
    assert a == b == [(0, 5)]


@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(1, 12)).map(lambda p: (p[0], p[0] + p[1])),
        min_size=1,
        max_size=14,
    )
)
@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_sweep_equals_naive_oracle(spark, spans):
    a, b = _run_both(spark, spans)
    assert a == b


def test_metrics_rollup_and_summary(spark, tiny):
    from kgx.metrics import graph_summary, partition_stats, triple_counts, triple_rollup

    t = tiny["golden_triples"]
    counts = {r["pred"]: r["n"] for r in triple_counts(t).collect()}
    assert set(counts) == {"mentions", "hasSMILES", "hasInChI", "synonymOf", "foundInRepo"}

    roll = triple_rollup(t).collect()
    grand = [r for r in roll if r["pred"] is None and r["subj_ns"] is None]
    assert grand[0]["n"] == sum(counts.values())

    summ = graph_summary(t).collect()[0]
    assert summ["n_triples"] == sum(counts.values())
    assert summ["n_subjects"] > 0

    ps = partition_stats(t.repartition(4)).collect()
    assert sum(r["rows"] for r in ps) == sum(counts.values())


def test_export_csv_rows(spark, tiny, tmp_path):
    from kgx.io.export import export_csv, extraction_rows
    from kgx.io.dictionary import detection_index
    from kgx.io.source import latest_versions, scan_source_files, with_file_identity
    from kgx.stages.detect import detect_mentions
    from kgx.stages.link import link_entities

    idx = detection_index(tiny["compound_dict"].toPandas())
    bc = spark.sparkContext.broadcast(idx)
    files = latest_versions(with_file_identity(tiny["source_files"]))
    mentions = detect_mentions(files, bc).localCheckpoint()
    links = link_entities(mentions, tiny["compound_dict"])
    rows = extraction_rows(mentions, links, tiny["compound_dict"])
    assert rows.count() == links.count()
    export_csv(rows.limit(50), str(tmp_path / "out"))
    got = spark.read.option("header", True).csv(str(tmp_path / "out"))
    assert got.count() == 50
    assert set(got.columns) >= {"repo", "path", "smiles", "inchikey", "method"}