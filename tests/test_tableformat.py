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


def test_format_selection_is_availability_gated(spark, monkeypatch):
    """Mock-level pin of the prod switch (r6 verdict ask #5): with the jar
    'present' the iceberg reader/writer is selected; without it the parquet
    realization is, for the SAME fmt='iceberg' request.  Keeps the branch
    honest without a runtime jar (the real-jar roundtrip stays skip-marked
    above)."""
    from unittest import mock

    import kgx.io.tableformat as tf

    # read side, jar "present"
    fake_spark = mock.MagicMock()
    monkeypatch.setattr(tf, "_iceberg_available", lambda s: True)
    tf.read_table(fake_spark, "db.tbl", fmt="iceberg")
    fake_spark.read.format.assert_called_once_with("iceberg")
    fake_spark.read.format.return_value.load.assert_called_once_with("db.tbl")
    fake_spark.read.parquet.assert_not_called()

    # read side, jar absent -> parquet fallback
    fake_spark2 = mock.MagicMock()
    monkeypatch.setattr(tf, "_iceberg_available", lambda s: False)
    tf.read_table(fake_spark2, "/p", fmt="iceberg")
    fake_spark2.read.parquet.assert_called_once_with("/p")
    fake_spark2.read.format.assert_not_called()

    # write side, jar "present" -> writeTo(...).partitionedBy(...).createOrReplace()
    fake_df = mock.MagicMock()
    monkeypatch.setattr(tf, "_iceberg_available", lambda s: True)
    tf.write_table(fake_df, "db.tbl", fmt="iceberg", partition_by=["pred"])
    fake_df.writeTo.assert_called_once_with("db.tbl")
    fake_df.writeTo.return_value.partitionedBy.return_value.createOrReplace.assert_called_once()
    fake_df.write.mode.assert_not_called()

    # write side, jar absent -> partitioned parquet
    fake_df2 = mock.MagicMock()
    monkeypatch.setattr(tf, "_iceberg_available", lambda s: False)
    tf.write_table(fake_df2, "/p", fmt="iceberg", partition_by=["pred"])
    fake_df2.write.mode.assert_called_once_with("overwrite")
    fake_df2.writeTo.assert_not_called()
