"""Contract pin for the table-format switch (SURVEY §0.4 hard-part 6).

The sandbox ships no Iceberg runtime jar, so the true-Iceberg branch is
exercised only where the jar exists (skip-marked here, runnable in prod);
what IS pinned in-sandbox: the availability probe answers without raising,
the config switch degrades to the partitioned-parquet realization instead
of crashing, and a parquet round-trip through read_table/write_table
preserves rows + partition layout.
"""

import pytest
from pyspark.sql import functions as F

from kgx.io.tableformat import _iceberg_available, read_table, write_table


def test_iceberg_probe_answers(spark):
    assert _iceberg_available(spark) in (True, False)


def test_parquet_roundtrip_with_partitioning(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("bucket")
    )
    uri = str(tmp_path / "t")
    write_table(df, uri, fmt="parquet", partition_by=["bucket"])
    assert (tmp_path / "t" / "bucket=0").exists()  # hive-style layout on disk
    back = read_table(spark, uri, fmt="parquet")
    assert back.count() == 100
    assert set(back.columns) == {"id", "bucket"}


def test_iceberg_switch_degrades_without_jar(spark, tmp_path):
    """fmt="iceberg" without the runtime jar must take the parquet
    realization (documented degraded mode), not raise."""
    if _iceberg_available(spark):
        pytest.skip("Iceberg jar present: the degraded path is not reachable")
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("string"))
    uri = str(tmp_path / "ice")
    write_table(df, uri, fmt="iceberg", partition_by=["p"])
    back = read_table(spark, uri, fmt="iceberg")
    assert back.count() == 10


def test_true_iceberg_roundtrip(spark, tmp_path):
    """The production branch: writeTo(...).partitionedBy(...).createOrReplace()
    + spark.read.format("iceberg").  Runs only where the runtime jar and a
    catalog are configured; skip-with-reason pins the contract in-sandbox."""
    if not _iceberg_available(spark):
        pytest.skip("no Iceberg runtime jar in sandbox (prod-only branch)")
    df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("string"))
    write_table(df, "local.db.kgx_contract_pin", fmt="iceberg", partition_by=["p"])
    back = read_table(spark, "local.db.kgx_contract_pin", fmt="iceberg")
    assert back.count() == 10
