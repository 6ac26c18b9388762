"""Structured Streaming increments (SURVEY §2 J1–J5) driven synchronously
with availableNow + memory/parquet sinks."""

import pytest
from pyspark.sql import functions as F

from kgx.io.dictionary import detection_index
from kgx.streaming.incremental import (
    dedup_late_files,
    incremental_extract,
    read_corpus_stream,
    session_ingest_windows,
    streamed_dedup_counts,
    windowed_ingest_metrics,
)


@pytest.fixture(scope="module")
def corpus_stream_dir(tiny, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    # two "arrival batches" of the tiny corpus
    sf = tiny["source_files"]
    a, b = sf.randomSplit([0.5, 0.5], seed=42)
    a.write.mode("overwrite").parquet(str(d / "batch"))
    b.write.mode("append").parquet(str(d / "batch"))
    return str(d / "batch")


def test_incremental_extract_matches_batch(spark, tiny, corpus_stream_dir, tmp_path):
    from kgx.io.source import with_file_identity
    from kgx.stages.detect import detect_mentions
    from kgx.stages.link import link_entities

    bc = spark.sparkContext.broadcast(detection_index(tiny["compound_dict"].toPandas()))
    stream = read_corpus_stream(spark, corpus_stream_dir, max_files=4)
    out_dir, ckpt = str(tmp_path / "links"), str(tmp_path / "ckpt")
    q = incremental_extract(stream, tiny["compound_dict"], bc, out_dir, ckpt).start()
    q.awaitTermination(timeout=300)

    got = spark.read.parquet(out_dir)
    # batch reference over the same (all-versions) corpus
    batch_links = link_entities(
        detect_mentions(with_file_identity(tiny["source_files"]), bc).localCheckpoint(),
        tiny["compound_dict"],
    )
    assert got.count() == batch_links.count()
    assert got.select("mention_id", "compound_id").exceptAll(
        batch_links.select("mention_id", "compound_id")
    ).count() == 0


def test_streaming_dedup_and_windows(spark, tiny, corpus_stream_dir):
    stream = read_corpus_stream(spark, corpus_stream_dir, max_files=64)

    deduped = dedup_late_files(stream)
    q = (
        deduped.select("file_key", "commit")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=300)
    got = spark.sql("SELECT * FROM dedup_out")
    assert got.count() == got.dropDuplicates(["file_key", "commit"]).count()
    assert got.count() == tiny["source_files"].count()  # no true dups in src

    for maker, name in (
        (lambda s: windowed_ingest_metrics(s, "5 minutes"), "win_out"),
        (lambda s: session_ingest_windows(s), "sess_out"),
    ):
        agg = maker(read_corpus_stream(spark, corpus_stream_dir, max_files=64))
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        assert spark.sql(f"SELECT SUM(n_files) AS n FROM {name}").collect()[0]["n"] == tiny[
            "source_files"
        ].count()

def test_streamed_dedup_counts_matches_batch(spark, tmp_path):
    """The driver-checkable streaming query (J1+J2+J5): staged-duplicate
    file stream -> watermark + cross-batch dropDuplicates -> foreachBatch
    upsert; final state must equal the plain batch GROUP BY counts."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 20, i % 24), ("a", "b", "c")[i % 3])
        for i in range(300)
    ]
    src = tmp_path / "events"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).write.parquet(str(src))

    work = tmp_path / "work"
    out = streamed_dedup_counts(spark, str(src), str(work), max_files=2, stage_files=4)
    got = {r.event_type: r.n for r in out.collect()}
    assert got == {"a": 100, "b": 100, "c": 100}

    # cross-batch state really exercised: 2 staged copies x 4 files at
    # maxFilesPerTrigger=2 -> multiple upsert epochs (one checkpoint commit
    # each), duplicates spanning microbatches
    commits = [
        p for p in (work / "ckpt" / "commits").iterdir() if not p.name.startswith(".")
    ]
    assert len(commits) >= 2
    # superseded state dirs are cleaned: at most current + its predecessor
    states = [p for p in work.iterdir() if p.name.startswith("state_")]
    assert 1 <= len(states) <= 2


def test_streamed_window_counts_matches_batch(spark, tmp_path):
    """J3 driver oracle: event-time tumbling windows over a multi-microbatch
    file stream must drain to exactly the batch GROUP BY day/type counts."""
    import datetime

    from kgx.streaming.incremental import streamed_window_counts

    rows = [
        (i, datetime.datetime(2024, 1, 1 + i % 5, i % 24), ("a", "b")[i % 2])
        for i in range(200)
    ]
    src = tmp_path / "events"
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    ).write.parquet(str(src))

    got = streamed_window_counts(spark, str(src), str(tmp_path / "w"), window="1 day")
    got_rows = {(r.day, r.event_type): r.n for r in got.collect()}
    want = {
        ((r["d"]), r["event_type"]): r["n"]
        for r in spark.read.parquet(str(src))
        .groupBy(
            F.date_trunc("day", "ts").cast("date").cast("string").alias("d"),
            "event_type",
        )
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert got_rows == want
    # the staged files split into >1 microbatch, so window state really
    # crossed batches
    commits = [
        p
        for p in (tmp_path / "w" / "ckpt" / "commits").iterdir()
        if not p.name.startswith(".")
    ]
    assert len(commits) >= 2


def test_streamed_dedup_counts_refuses_dirty_work_dir(spark, tmp_path):
    """Reusing a work_dir would stage extra copies the old checkpoint skips
    (silently shifted counts) — it must be rejected up front."""
    src = tmp_path / "events"
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")], "event_id long, ts string, event_type string"
    ).select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "event_type"
    ).write.parquet(str(src))
    work = tmp_path / "work"
    work.mkdir()
    (work / "stage").mkdir()  # leftover from a previous run
    with pytest.raises(ValueError, match="empty work_dir"):
        streamed_dedup_counts(spark, str(src), str(work))


def test_merge_epoch_state_retry_is_idempotent(spark, tmp_path):
    """A retried microbatch (same epoch_id, possibly after a partial write)
    must merge against the same disk predecessor and overwrite its own
    output — final state identical to a single clean application."""
    from kgx.streaming.incremental import _merge_epoch_state

    work = str(tmp_path / "state_work")
    c1 = spark.createDataFrame([("a", 2), ("b", 1)], "event_type string, n long")
    c2 = spark.createDataFrame([("a", 1), ("c", 4)], "event_type string, n long")
    _merge_epoch_state(work, c1, 0, "event_type")
    _merge_epoch_state(work, c2, 1, "event_type")
    _merge_epoch_state(work, c2, 1, "event_type")  # retry of epoch 1
    got = {
        r.event_type: r.n for r in spark.read.parquet(f"{work}/state_1").collect()
    }
    assert got == {"a": 3, "b": 1, "c": 4}  # not double-counted
    # epoch 0 (the predecessor epoch 1 reads) survives for a further retry
    import os

    assert sorted(d for d in os.listdir(work) if d.startswith("state_")) == [
        "state_0",
        "state_1",
    ]
