"""Table-format abstraction (SURVEY §0.4, §7 hard-part 6).

Production target is Iceberg (``spark.read.format("iceberg")``,
``df.writeTo(...).partitionedBy(...)``); the sandbox has no Iceberg runtime
jar, so the default realization is an Iceberg-shaped partitioned Parquet
layout.  Swapping is a config switch, not a code change: every scan/sink in
kgx goes through this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, uri: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg" and _iceberg_available(spark):
        return spark.read.format("iceberg").load(uri)
    return spark.read.parquet(uri)


def write_table(
    df: DataFrame,
    uri: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    if fmt == "iceberg" and _iceberg_available(df.sparkSession):
        w = df.writeTo(uri)
        if partition_by:
            from pyspark.sql import functions as F

            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(uri)
