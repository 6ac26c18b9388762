"""Per-stage checkpointing with per-partition lineage + exact resume
(SURVEY §2 A3/D4/E7; BASELINE.json:L6 "Every stage checkpoints per-partition
lineage and row-count/latency metrics to enable exact resume mid-pipeline").

Protocol (idempotent per (run_id, stage)):

1. If ``<run_dir>/<run_id>/<stage>/_COMMITTED`` exists -> read the parquet
   back (exact resume: downstream plans consume identical bytes).  Callers
   (kgx.pipeline.run_pipeline) consult :func:`is_committed` BEFORE building
   the stage so nothing upstream re-executes.
2. Else: write the stage output as parquet, then record one lineage row per
   materialized partition — row count + order-insensitive content
   fingerprint (sum of xxhash64 over all columns) + wall-clock — and only
   then drop the commit marker.  A job killed mid-stage leaves no marker,
   so the rerun rewrites that stage from its (already-committed) inputs and
   nothing upstream re-executes.

All marker/lineage filesystem access goes through the Hadoop FileSystem API
(resolved per-path), so ``run_dir`` may be a local path, ``hdfs://…`` or
``s3a://…`` — the same scheme space ``df.write.parquet`` accepts.  The
driver never assumes POSIX.

The fingerprint makes resume *verifiable*: a rerun of a committed stage
must reproduce the same per-stage total fingerprint (tests assert this).

The reference has no equivalent — a killed MolMiner run restarts from zero
[PK: one-shot CLI]; this protocol is mandated by the spec instead.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(cfg, stage: str) -> str:
    # plain string joins, NOT pathlib: pathlib collapses the double slash
    # in scheme://…, silently turning s3a://bucket into s3a:/bucket
    return f"{str(cfg.run_dir).rstrip('/')}/{cfg.run_id}/{stage}"


def _fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Hadoop Path) for any supported scheme."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath


def _active(spark: SparkSession | None) -> SparkSession:
    s = spark or SparkSession.getActiveSession()
    if s is None:
        raise RuntimeError("checkpoint API needs an active SparkSession")
    return s


def is_committed(cfg, stage: str, spark: SparkSession | None = None) -> bool:
    spark = _active(spark)
    fs, marker = _fs(spark, _stage_dir(cfg, stage) + "/_COMMITTED")
    return fs.exists(marker)


def committed_output(spark: SparkSession, cfg, stage: str) -> DataFrame:
    """Read back the parquet of an already-committed stage.

    Callers should consult :func:`is_committed` FIRST and skip even
    *constructing* the stage when it is committed — stages like
    ``link_entities`` (eager localCheckpoint) and ``connected_components``
    (eager iterative loop) execute work at build time, which
    ``stage_checkpoint`` alone cannot undo.
    """
    return spark.read.parquet(_stage_dir(cfg, stage) + "/data")


def _write_marker(spark: SparkSession, path: str, payload: str) -> None:
    fs, hpath = _fs(spark, path)
    out = fs.create(hpath, True)  # overwrite=True: recommit replaces
    try:
        out.write(bytearray(payload.encode("utf-8")))
    finally:
        out.close()


def lineage_df(spark: SparkSession, cfg) -> DataFrame:
    """All lineage rows recorded under this run (one dir per stage, so a
    recommitted stage *replaces* its lineage instead of appending duplicates)."""
    return spark.read.parquet(f"{str(cfg.run_dir).rstrip('/')}/{cfg.run_id}/*/lineage")


def stage_checkpoint(spark: SparkSession, df: DataFrame, stage: str, cfg) -> DataFrame:
    """Commit ``df`` as the output of ``stage`` (or resume it) and return
    the materialized DataFrame. No-op passthrough when cfg.run_dir is None."""
    if cfg.run_dir is None:
        return df

    sdir = _stage_dir(cfg, stage)
    data_dir = sdir + "/data"
    if not is_committed(cfg, stage, spark):
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(data_dir)
        wall_ms = int((time.monotonic() - t0) * 1000)

        written = spark.read.parquet(data_dir)
        # order-insensitive content fingerprint; the sum runs in decimal(38)
        # so it cannot hit ANSI long-overflow, then folds back to a long
        lineage = (
            written.select(F.spark_partition_id().alias("partition_id"),
                           F.xxhash64(*written.columns).cast("decimal(38,0)").alias("__h"))
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("output_rows"),
                F.pmod(F.sum("__h"), F.lit(2**61).cast("decimal(38,0)"))
                .cast("long")
                .alias("fingerprint"),
            )
            .select(
                F.lit(cfg.run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                "partition_id",
                "output_rows",
                "fingerprint",
                F.lit(wall_ms).alias("wall_ms"),
                F.current_timestamp().alias("committed_at"),
            )
        )
        lineage.write.mode("overwrite").parquet(sdir + "/lineage")
        _write_marker(
            spark, sdir + "/_COMMITTED", json.dumps({"stage": stage, "wall_ms": wall_ms})
        )
    return spark.read.parquet(data_dir)


def resume_anti_join(df: DataFrame, committed: DataFrame, key: str) -> DataFrame:
    """Finer-grained resume (SURVEY §2 D4): drop input rows whose ``key``
    already appears in a committed output — e.g. re-ingesting a corpus delta
    without re-detecting files already processed."""
    return df.join(committed.select(key).distinct(), key, "left_anti")


def stage_fingerprint(spark: SparkSession, cfg, stage: str) -> int:
    """Total (partition-order-independent) fingerprint of a committed stage."""
    rows = (
        lineage_df(spark, cfg)
        .filter(F.col("stage") == stage)
        .agg(
            F.pmod(
                F.sum(F.col("fingerprint").cast("decimal(38,0)")),
                F.lit(2**61).cast("decimal(38,0)"),
            )
            .cast("long")
            .alias("f"),
            F.sum("output_rows").alias("n"),
        )
        .collect()[0]
    )
    return (rows["f"] or 0, rows["n"] or 0)
