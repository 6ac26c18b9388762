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
* :func:`streamed_dedup_counts`   — J1+J2+J5 composed so the final state
  equals a plain batch aggregate: the driver-checkable streaming oracle.
* :func:`streamed_window_counts`  — J3 composed the same way: event-time
  tumbling windows drained to a state equal to the batch GROUP BY.
* :func:`streamed_session_counts` — J4 composed the same way: per-user
  session windows merged cross-batch, drained to a state equal to batch
  gaps-and-islands sessionization.
"""

from __future__ import annotations

import os
import shutil
import uuid

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


def extract_epoch(batch_df: DataFrame, epoch_id: int, dict_df: DataFrame, index_bc, out_dir: str) -> None:
    """One microbatch of the incremental extract: (detect ∘ link) with the
    SAME batch-stage functions the batch pipeline uses, then an
    epoch-partitioned DYNAMIC-overwrite write.

    Idempotent per epoch: the sink is partitioned by ``epoch`` and written
    with ``partitionOverwriteMode=dynamic`` (a per-write option — the
    session conf is untouched), so a RETRIED microbatch — Structured
    Streaming replays the epoch when a failure lands between the sink write
    and the checkpoint commit — replaces exactly its own ``epoch=<id>``
    partition instead of appending a duplicate row set.  Other epochs'
    partitions are untouched by construction of dynamic mode.
    """
    from kgx.io.source import with_file_identity
    from kgx.stages.detect import detect_mentions
    from kgx.stages.link import link_entities

    files = with_file_identity(batch_df.drop("ingest_ts"))
    mentions = detect_mentions(files, index_bc).localCheckpoint()
    links = link_entities(mentions, dict_df)
    (
        links.withColumn("epoch", F.lit(epoch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch")
        .parquet(out_dir)
    )


def incremental_extract(
    stream: DataFrame,
    dict_df: DataFrame,
    index_bc,
    out_dir: str,
    checkpoint_dir: str,
):
    """J1+J5: stream → (detect ∘ link) per microbatch → epoch-partitioned
    parquet sink (dynamic partition overwrite; see :func:`extract_epoch`).

    foreachBatch gives exactly-once-per-batch semantics against an
    idempotent sink; the batch functions are the SAME objects the batch
    pipeline uses, so semantics cannot drift between modes, and the
    epoch-keyed overwrite makes the sink genuinely idempotent under epoch
    replay (mirroring the discipline :func:`_merge_epoch_state` applies to
    the aggregate-state sink).
    """

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        extract_epoch(batch_df, epoch_id, dict_df, index_bc, out_dir)

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )


def dedup_late_files(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """J2: drop duplicate (file_key, commit) arrivals that land within the
    watermark horizon of each other; state for keys older than the horizon
    is EVICTED (bounded state — a duplicate arriving after eviction
    re-emits, the documented trade of every watermarked dedup).

    ``dropDuplicatesWithinWatermark``, not classic ``dropDuplicates``
    (round-7): without the event-time column in the dedup keys the classic
    operator never evicts — measured numRowsRemoved=0 with monotonically
    growing state across watermark advances — so its state was
    corpus-unbounded and the watermark decorative.  Eviction + late-row
    semantics are pinned by test_watermark_eviction_* in
    tests/test_streaming.py."""
    from kgx.io.source import with_file_identity

    keyed = with_file_identity(stream)
    return keyed.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["file_key", "commit"]
    )


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


def streamed_dedup_counts(
    spark: SparkSession,
    table_path: str,
    work_dir: str,
    key_col: str = "event_id",
    ts_col: str = "ts",
    group_col: str = "event_type",
    dup_copies: int = 2,
    max_files: int = 2,
    stage_files: int = 4,
    watermark: str = "87600 hours",
) -> DataFrame:
    """J1+J2+J5 composed into a BATCH-CHECKABLE result: file-source stream
    → watermark dedup → foreachBatch upsert, whose final table equals the
    plain batch ``SELECT group_col, COUNT(*) ... GROUP BY`` over the input
    — the driver's DuckDB oracle for the streaming path.

    Construction makes the equality exact, not probabilistic:

    * the input table is staged as ``dup_copies`` complete file sets
      (``stage_files`` files each) and streamed with ``maxFilesPerTrigger``
      — every row arrives >1 time, usually in DIFFERENT microbatches, so
      ``dropDuplicates`` exercises real cross-batch state, not
      within-batch distinct;
    * the watermark horizon (default 10 years) exceeds any fixture's
      timestamp span, so dedup state is never evicted mid-stream — the
      watermark code path runs, but no duplicate can slip past an eviction
      and break determinism;
    * foreachBatch upserts per-group counts into a versioned parquet state:
      the previous state is the highest ``state_<N>`` directory ON DISK
      with ``N < epoch_id`` (never an in-memory pointer), each epoch writes
      ``state_<epoch_id>`` with overwrite, and state dirs older than the
      predecessor just read are deleted (the predecessor itself is kept so
      a retry of the current epoch can re-read it — live state is bounded
      at two dirs).  Keying the read off the durable ``epoch_id`` makes a
      RETRIED microbatch exact — the retry re-reads the same predecessor
      and replaces its own output — which a driver-side running
      dict cannot guarantee (it may already include the failed attempt).  After ``availableNow`` drains, the surviving state
      is exactly the global aggregate regardless of how files were batched.
      Each ``state_<N>`` dir is COMMITTED by an atomic directory rename
      (written as ``_tmp_state_<N>_<uuid>`` then ``os.rename``-ed into
      place), so a crash at ANY point leaves every visible ``state_<N>``
      complete — a torn attempt leaves only a ``_tmp_state_*`` dir that
      the epoch listing ignores and the next merge sweeps.  A
      transactional table format (Iceberg MERGE) remains the production
      sink where the state must live on an object store without atomic
      rename.

    ``work_dir`` must be EMPTY (or absent): the staged file sets and the
    stream checkpoint are keyed to one run — reusing a dirty work_dir would
    stage a third copy set while the old checkpoint skips it, silently
    shifting counts.  State listing uses the local filesystem (this
    harness); an object-store deployment swaps in its listing API.

    At scale the same shape holds: state is one row per group (not per
    key) in the sink, per-key dedup state is Spark-managed and
    watermark-bounded in production (shrink the horizon to the real
    late-data bound), and the sink merge is a broadcast-sized join.
    """
    if os.path.isdir(work_dir) and os.listdir(work_dir):
        raise ValueError(
            f"streamed_dedup_counts requires an empty work_dir, got non-empty {work_dir!r}"
        )
    batch_df = spark.read.parquet(table_path)
    stage_dir = f"{work_dir}/stage"
    for _ in range(dup_copies):
        batch_df.repartition(stage_files).write.mode("append").parquet(stage_dir)

    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage_dir)
        # event-time watermarks require TIMESTAMP (ltz); parquet fixtures
        # may carry TIMESTAMP_NTZ
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        # dropDuplicatesWithinWatermark, NOT classic dropDuplicates
        # (round-7): with the event-time column absent from the dedup keys,
        # classic dropDuplicates NEVER evicts its state — measured on this
        # tree: numRowsRemoved stayed 0 and numRowsTotal grew monotonically
        # across watermark advances, i.e. the withWatermark was decorative
        # and state was corpus-unbounded (a 100-TB scale-killer, guide §5).
        # The WithinWatermark variant evicts keys older than the horizon
        # while guaranteeing dedup for duplicates that arrive within it —
        # identical output whenever duplicate spacing < horizon, which the
        # fixture's 10-year default makes exact (oracle-verified).
        .dropDuplicatesWithinWatermark([key_col])
    )

    def upsert(mb: DataFrame, epoch_id: int) -> None:
        counts = mb.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n"))
        _merge_epoch_state(work_dir, counts, epoch_id, group_col)

    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    epochs = _state_epochs(work_dir)
    if not epochs:
        raise RuntimeError(f"stream produced no microbatches from {stage_dir}")
    return spark.read.parquet(f"{work_dir}/state_{epochs[-1]}")


def _state_epochs(work_dir: str) -> list[int]:
    """Committed state epochs: ``_tmp_state_*`` staging dirs (uncommitted
    attempts) never match the ``state_<digits>`` shape, so a crash mid-write
    is invisible here."""
    if not os.path.isdir(work_dir):
        return []
    return sorted(
        int(d.rsplit("_", 1)[1])
        for d in os.listdir(work_dir)
        if d.startswith("state_") and d.rsplit("_", 1)[1].isdigit()
    )


def _commit_state_dir(tmp: str, final: str) -> None:
    """Atomically publish a fully-written state dir.  A pre-existing final
    dir (a completed attempt whose checkpoint commit failed) is removed
    first; if a crash lands between the rmtree and the rename, the epoch
    simply looks unwritten and the replay recreates it from the still-kept
    predecessor — no reader ever sees a partial ``state_<N>``."""
    if os.path.isdir(final):
        shutil.rmtree(final)
    os.rename(tmp, final)


def _merge_epoch_state(work_dir: str, counts: DataFrame, epoch_id: int, group_col: str) -> None:
    """Merge one microbatch's per-group counts into the versioned state.

    Idempotent per epoch: the previous state is the highest ``state_<N>``
    ON DISK with ``N < epoch_id`` (never an in-memory pointer), and this
    epoch's output replaces ``state_<epoch_id>`` — so a retried epoch
    re-reads the same predecessor and replaces its own partial write.

    Crash-atomic per epoch: the parquet is written to a ``_tmp_state_*``
    staging dir and published with one ``os.rename`` (atomic on POSIX
    local/NFS filesystems; an object-store deployment swaps this for a
    transactional table commit).  A crash mid-write leaves only staging
    garbage that the next merge sweeps — every dir matching
    ``state_<N>`` is complete by construction.

    Cleanup keeps the predecessor that was read (a retry of THIS epoch
    still needs it) and deletes everything older, bounding live state dirs
    at two regardless of stream length.
    """
    # sweep staging garbage from crashed attempts (merges are serial per
    # query, so any _tmp_state_* that exists when we start is dead)
    os.makedirs(work_dir, exist_ok=True)  # first epoch may precede the dir
    for d in os.listdir(work_dir):
        if d.startswith("_tmp_state_"):
            shutil.rmtree(os.path.join(work_dir, d), ignore_errors=True)

    prior = [n for n in _state_epochs(work_dir) if n < epoch_id]
    if prior:
        prev = counts.sparkSession.read.parquet(f"{work_dir}/state_{prior[-1]}")
        counts = (
            prev.unionByName(counts)
            .groupBy(group_col)
            .agg(F.sum("n").cast("long").alias("n"))
        )
    tmp = f"{work_dir}/_tmp_state_{epoch_id}_{uuid.uuid4().hex[:8]}"
    counts.write.mode("overwrite").parquet(tmp)
    _commit_state_dir(tmp, f"{work_dir}/state_{epoch_id}")
    for n in prior[:-1]:  # superseded BEFORE the predecessor; keep prior[-1]
        shutil.rmtree(f"{work_dir}/state_{n}", ignore_errors=True)


def streamed_window_counts(
    spark: SparkSession,
    table_path: str,
    work_dir: str,
    ts_col: str = "ts",
    group_col: str = "event_type",
    window: str = "1 day",
    max_files: int = 2,
    stage_files: int = 4,
    watermark: str = "87600 hours",
) -> DataFrame:
    """J3 composed into a BATCH-CHECKABLE result: file-source stream →
    EVENT-TIME tumbling-window aggregation → complete-mode memory sink,
    whose drained state equals the plain batch
    ``GROUP BY date_trunc(window, ts), group_col`` over the input — the
    driver's DuckDB oracle for the streaming-window path.

    Construction mirrors :func:`streamed_dedup_counts`: the input is staged
    as ``stage_files`` files and streamed ``max_files`` per trigger, so
    rows of the SAME window arrive across DIFFERENT microbatches and the
    windowed state is genuinely updated cross-batch (event times are not
    sorted across files).  The watermark horizon exceeds the fixture span,
    so no window is evicted before the stream drains; complete output mode
    re-emits the full (small: one row per window×group) aggregate.

    At scale: output mode becomes ``update`` with a MERGE-into-table sink,
    and the watermark shrinks to the real late-data bound so window state
    is evicted — the aggregation plan (event-time window + group) is
    unchanged.  ``work_dir`` must be empty, as in streamed_dedup_counts.

    Timezone: ``F.window(ts, '1 day')`` buckets align to the UTC epoch,
    while the batch oracle's ``date_trunc('day', ts)`` truncates in the
    session timezone — the two only agree when the session timezone is
    UTC.  The caller's session is not ours to assume (the driver hands an
    arbitrary one), so the session timezone is pinned to UTC for the
    duration and restored after the drain; the NTZ→timestamp cast then
    interprets wall-clock fixture times as UTC too, matching DuckDB's
    naive truncation exactly.
    """
    if os.path.isdir(work_dir) and os.listdir(work_dir):
        raise ValueError(
            f"streamed_window_counts requires an empty work_dir, got non-empty {work_dir!r}"
        )
    tz_key = "spark.sql.session.timeZone"
    tz_prev = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        return _streamed_window_counts(
            spark, table_path, work_dir, ts_col, group_col, window, max_files, stage_files, watermark
        )
    finally:
        spark.conf.set(tz_key, tz_prev)


def _streamed_window_counts(
    spark: SparkSession,
    table_path: str,
    work_dir: str,
    ts_col: str,
    group_col: str,
    window: str,
    max_files: int,
    stage_files: int,
    watermark: str,
) -> DataFrame:
    batch_df = spark.read.parquet(table_path)
    stage_dir = f"{work_dir}/stage"
    batch_df.repartition(stage_files).write.mode("overwrite").parquet(stage_dir)

    name = f"win_counts_{uuid.uuid4().hex[:12]}"
    agg = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage_dir)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), group_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).select(
        F.col("win.start").cast("date").cast("string").alias("day"),
        group_col,
        "n",
    )
    # pin the tiny result so the memory sink table can be dropped
    out = out.localCheckpoint()
    spark.catalog.dropTempView(name)
    return out


def session_ingest_windows(stream: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """J4: per-repo ingest sessions (bursts of commits land together)."""
    return (
        stream.withWatermark("ingest_ts", "1 hour")
        .groupBy(F.session_window("ingest_ts", gap).alias("session"), "repo")
        .agg(F.count(F.lit(1)).alias("n_files"))
    )


def streamed_session_counts(
    spark: SparkSession,
    table_path: str,
    work_dir: str,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "4 hours",
    max_files: int = 2,
    stage_files: int = 4,
    watermark: str = "87600 hours",
) -> DataFrame:
    """J4 composed into a BATCH-CHECKABLE result: file-source stream →
    EVENT-TIME session windows (``session_window(ts, gap)`` per user) →
    complete-mode memory sink, whose drained state equals batch
    gaps-and-islands sessionization — the driver's DuckDB oracle for the
    session-window path.

    Construction mirrors :func:`streamed_window_counts`: the input is
    staged as ``stage_files`` files (hash-repartitioned, so event times are
    NOT sorted across files) and streamed ``max_files`` per trigger — rows
    of the SAME session arrive in DIFFERENT microbatches and the state
    store genuinely MERGES session windows cross-batch (two disjoint
    partial sessions whose gap-extended intervals overlap collapse into
    one), which a per-batch GROUP BY could never do.

    Merge semantics (verified empirically on this Spark build, and what
    the oracle must mirror): an event extends the current session iff
    ``ts - prev_ts <= gap`` — a new session starts strictly AFTER the gap —
    and the emitted window is ``[min_ts, max_ts + gap)``.  The equivalent
    batch/SQL form is the classic gaps-and-islands: flag
    ``ts - lag(ts) OVER (PARTITION BY user ORDER BY ts) > gap`` as a
    session break, running-sum the flags into a session id, group.

    Timestamps are emitted as EPOCH MICROSECONDS (bigint) so oracle
    equality is independent of timestamp rendering; the session timezone
    is pinned to UTC for the duration (and restored) so the NTZ→timestamp
    cast and ``unix_micros`` agree with DuckDB's naive ``epoch_us``.

    At scale: session state is per-(user, open-session) and watermark
    eviction bounds it to the late-data horizon; output mode becomes
    ``update`` with a MERGE-into-table sink.  The fixture-sized drain uses
    complete mode with a horizon beyond the data span, as in
    :func:`streamed_window_counts`.  ``work_dir`` must be empty.
    """
    if os.path.isdir(work_dir) and os.listdir(work_dir):
        raise ValueError(
            f"streamed_session_counts requires an empty work_dir, got non-empty {work_dir!r}"
        )
    tz_key = "spark.sql.session.timeZone"
    tz_prev = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "UTC")
    try:
        return _streamed_session_counts(
            spark, table_path, work_dir, ts_col, user_col, gap, max_files, stage_files, watermark
        )
    finally:
        spark.conf.set(tz_key, tz_prev)


def _streamed_session_counts(
    spark: SparkSession,
    table_path: str,
    work_dir: str,
    ts_col: str,
    user_col: str,
    gap: str,
    max_files: int,
    stage_files: int,
    watermark: str,
) -> DataFrame:
    batch_df = spark.read.parquet(table_path)
    stage_dir = f"{work_dir}/stage"
    batch_df.repartition(stage_files).write.mode("overwrite").parquet(stage_dir)

    name = f"sess_counts_{uuid.uuid4().hex[:12]}"
    agg = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(stage_dir)
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), user_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"{work_dir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).select(
        user_col,
        F.unix_micros(F.col("sess.start")).alias("session_start_us"),
        F.unix_micros(F.col("sess.end")).alias("session_end_us"),
        "n_events",
    )
    # pin the tiny result so the memory sink table can be dropped
    out = out.localCheckpoint()
    spark.catalog.dropTempView(name)
    return out
