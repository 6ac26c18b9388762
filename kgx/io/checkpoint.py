"""Per-stage checkpointing with per-partition lineage + exact resume
(SURVEY §2 A3/D4/E7; BASELINE.json:L6 "Every stage checkpoints per-partition
lineage and row-count/latency metrics to enable exact resume mid-pipeline").

Protocol (idempotent per (run_id, stage)):

1. If ``<run_dir>/<run_id>/<stage>/_COMMITTED`` exists -> read the parquet
   back (exact resume: downstream plans consume identical bytes).
2. Else: write the stage output as parquet, then record one lineage row per
   materialized partition — row count + order-insensitive content
   fingerprint (sum of xxhash64 over all columns) + wall-clock — and only
   then drop the commit marker.  A job killed mid-stage leaves no marker,
   so the rerun rewrites that stage from its (already-committed) inputs and
   nothing upstream re-executes.

The fingerprint makes resume *verifiable*: a rerun of a committed stage
must reproduce the same per-stage total fingerprint (tests assert this).

The reference has no equivalent — a killed MolMiner run restarts from zero
[PK: one-shot CLI]; this protocol is mandated by the spec instead.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _stage_dir(cfg, stage: str) -> Path:
    return Path(cfg.run_dir) / cfg.run_id / stage


def is_committed(cfg, stage: str) -> bool:
    return (_stage_dir(cfg, stage) / "_COMMITTED").exists()


def lineage_df(spark: SparkSession, cfg) -> DataFrame:
    """All lineage rows recorded under this run (one dir per stage, so a
    recommitted stage *replaces* its lineage instead of appending duplicates)."""
    return spark.read.parquet(str(Path(cfg.run_dir) / cfg.run_id / "*" / "lineage"))


def stage_checkpoint(spark: SparkSession, df: DataFrame, stage: str, cfg) -> DataFrame:
    """Commit ``df`` as the output of ``stage`` (or resume it) and return
    the materialized DataFrame. No-op passthrough when cfg.run_dir is None."""
    if cfg.run_dir is None:
        return df

    sdir = _stage_dir(cfg, stage)
    data_dir = sdir / "data"
    if not is_committed(cfg, stage):
        t0 = time.monotonic()
        df.write.mode("overwrite").parquet(str(data_dir))
        wall_ms = int((time.monotonic() - t0) * 1000)

        written = spark.read.parquet(str(data_dir))
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
        lineage.write.mode("overwrite").parquet(str(sdir / "lineage"))
        (sdir / "_COMMITTED").write_text(
            json.dumps({"stage": stage, "wall_ms": wall_ms})
        )
    return spark.read.parquet(str(data_dir))


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
