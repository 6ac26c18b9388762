"""Physical-plan assertions (SURVEY §4): the optimizations we rely on must
actually appear in the plan — pushdown reaching the scan, broadcast joins on
the lexicon side, whole-stage codegen on the hot path, no fat-column
shuffles after stage 1."""

from pyspark.sql import functions as F

from kgx.io.dictionary import detection_index
from kgx.io.source import scan_source_files, with_file_identity
from kgx.stages.detect import detect_mentions
from kgx.stages.link import link_entities


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_and_projection_pushdown(spark, tiny_dir):
    df = spark.read.parquet(f"{tiny_dir}/source_files.parquet")
    q = df.filter(F.col("lang") == "python").select("repo", "path")
    plan = _plan(q)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200]
    # column pruning: content must NOT be read for this projection
    read_schema = plan.split("ReadSchema")[1][:300]
    assert "content" not in read_schema
    assert "repo" in read_schema and "path" in read_schema


def test_latest_commit_map_prunes_content(spark, tiny_dir):
    from kgx.io.source import latest_commit_map

    plan = _plan(latest_commit_map(spark, f"{tiny_dir}/source_files.parquet"))
    assert "content" not in plan.split("ReadSchema")[1][:300]


def test_link_uses_broadcast_joins(spark, tiny):
    idx = detection_index(tiny["compound_dict"].toPandas())
    bc = spark.sparkContext.broadcast(idx)
    mentions = detect_mentions(with_file_identity(tiny["source_files"]), bc).localCheckpoint()
    links = link_entities(mentions, tiny["compound_dict"])
    plan = _plan(links)
    assert "BroadcastHashJoin" in plan
    # the lexicon side must never arrive via SortMergeJoin
    assert plan.count("BroadcastHashJoin") >= 3


def test_scan_keyed_plan_has_codegen(spark, tiny_dir):
    files = scan_source_files(spark, f"{tiny_dir}/source_files.parquet")
    plan = _plan(files)
    # codegen'd spans print as "*(n)" in the executed plan string
    assert "*(1)" in plan or "WholeStageCodegen" in plan  # sha2/concat_ws in codegen


def test_triples_partitioned_by_pred_on_disk(spark, tiny, tmp_path):
    from kgx.stages.materialize import write_triples

    write_triples(tiny["golden_triples"], str(tmp_path / "t"))
    parts = {p.name for p in (tmp_path / "t").iterdir() if p.is_dir()}
    assert {"pred=mentions", "pred=hasSMILES", "pred=foundInRepo"} <= parts
    # partition pruning: reading one predicate touches one directory
    one = spark.read.parquet(str(tmp_path / "t")).filter(F.col("pred") == "mentions")
    assert "PartitionFilters" in _plan(one)