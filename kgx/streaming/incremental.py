"""Structured-Streaming increments (SURVEY §2 J1–J5 — extension, NOT in the
reference: MolMiner is a one-shot CLI [PK]).

Design rule: the batch stage functions are reused verbatim inside
``foreachBatch`` — streaming is an ingestion mode, not a second engine.

* :func:`incremental_extract`   — J1/J5: file-source stream of new corpus
  parquet → per-microbatch detect+link (the same kgx.stages functions) →
  append to a mentions/links sink via foreachBatch.
* :func:`dedup_late_files`      — J2: watermark + dropDuplicates on
  (file_key, commit) for late/duplicate file events.
* :func:`windowed_ingest_metrics` — J3: tumbling/sliding counts.
* :func:`session_ingest_windows`  — J4: per-repo session windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx.schemas import SOURCE_FILES


def read_corpus_stream(spark: SparkSession, path: str, max_files: int = 16) -> DataFrame:
    """J1: incremental ingest of new corpus files (parquet directory source;
    swap format for an Iceberg/Kafka source in production)."""
    return (
        spark.readStream.schema(SOURCE_FILES)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
        .withColumn("ingest_ts", F.current_timestamp())
    )


def incremental_extract(
    stream: DataFrame,
    dict_df: DataFrame,
    index_bc,
    out_dir: str,
    checkpoint_dir: str,
):
    """J1+J5: stream → (detect ∘ link) per microbatch → append parquet sink.

    foreachBatch gives exactly-once-per-batch semantics against an
    idempotent sink; the batch functions are the SAME objects the batch
    pipeline uses, so semantics cannot drift between modes.
    """
    from kgx.io.source import with_file_identity
    from kgx.stages.detect import detect_mentions
    from kgx.stages.link import link_entities

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        files = with_file_identity(batch_df.drop("ingest_ts"))
        mentions = detect_mentions(files, index_bc).localCheckpoint()
        links = link_entities(mentions, dict_df)
        links.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(out_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def dedup_late_files(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """J2: drop late duplicate (file_key, commit) arrivals within the
    watermark horizon."""
    from kgx.io.source import with_file_identity

    keyed = with_file_identity(stream)
    return keyed.withWatermark("ingest_ts", watermark).dropDuplicates(["file_key", "commit"])


def windowed_ingest_metrics(
    stream: DataFrame, window: str = "10 minutes", slide: str | None = None
) -> DataFrame:
    """J3: tumbling (or sliding) ingest counts by language."""
    win = F.window("ingest_ts", window, slide) if slide else F.window("ingest_ts", window)
    return (
        stream.withWatermark("ingest_ts", "30 minutes")
        .groupBy(win, "lang")
        .agg(F.count(F.lit(1)).alias("n_files"), F.sum(F.length("content")).alias("bytes"))
    )


def session_ingest_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """J4: per-repo ingest sessions (bursts of commits land together)."""
    return (
        stream.withWatermark("ingest_ts", "1 hour")
        .groupBy(F.session_window("ingest_ts", gap).alias("session"), "repo")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )
