"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``      — flagship query: full kgx pipeline on the tiny
                        synthesized corpus, then "top compounds by distinct
                        repo count" over the produced triples.
``queries()``         — one callable per implemented operator family from
                        SURVEY.md §2 (scans, filters, joins incl. anti/semi/
                        range/salted, aggregations incl. rollup, windows,
                        sorts, set ops, string/hash/JSON/date/array/HOF
                        functions, plus the kgx pipeline stages themselves).
``oracle_sql()``      — DuckDB-runnable ANSI SQL equivalents.  Relational
                        operators run against the driver's pre-registered
                        sf-dir views; kgx pipeline operators are checked
                        against the *golden* fixture parquet via
                        read_parquet() — an independent ground truth, not a
                        re-implementation.

Column names/types are aligned on both sides (every computed column aliased
identically; sums cast; doubles rounded) because the driver hash-compares
values after sorting columns by name.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_REPO = "/root/repo"
if _REPO not in sys.path:  # kgx importable regardless of the caller's cwd
    sys.path.insert(0, _REPO)

FIXTURE_BASE = "/root/repo/tests/fixtures"
_PIPE_CACHE: dict = {}
_SHIPPED: set = set()


def _ship_kgx(spark: SparkSession) -> None:
    """Make kgx importable inside Spark's PYTHON WORKERS regardless of the
    driver process's cwd: driver-side sys.path does NOT propagate to
    workers, so UDF closures referencing kgx would fail to unpickle there.
    addPyFile ships a zip once per SparkContext."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    zpath = os.path.join(tempfile.mkdtemp(prefix="kgx_ship_"), "kgx.zip")
    pkg_root = os.path.join(_REPO, "kgx")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirs, files in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, _REPO))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)


def _shipped(fn: Callable) -> Callable:
    def wrapper(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_kgx(spark)
        return fn(spark, sf_dir)

    return wrapper


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fixture_dir(scale: str = "tiny") -> str:
    from kgx.fixtures.gen import ensure

    return str(ensure(scale, FIXTURE_BASE))


def _pipeline_outputs(spark: SparkSession, scale: str = "tiny") -> dict:
    """Run (once per session) the kgx pipeline on the synthesized corpus."""
    _ship_kgx(spark)
    key = (id(spark), scale)
    if key not in _PIPE_CACHE:
        from kgx.pipeline import PipelineConfig, run_pipeline

        d = _fixture_dir(scale)
        cfg = PipelineConfig(
            source_uri=f"{d}/source_files.parquet",
            dict_uri=f"{d}/compound_dict.parquet",
            num_partitions=8,
            # the mention-level driver queries consume out["mentions"];
            # opt in so the handle is bound to the fused checkpoint
            # (recompute-free) instead of omitted
            materialize_mentions=True,
        )
        out = run_pipeline(spark, cfg)
        out["triples"] = out["triples"].localCheckpoint()
        out["mentions"] = out["mentions"].localCheckpoint()
        out["links"] = out["links"].localCheckpoint()
        _PIPE_CACHE[key] = out
    return _PIPE_CACHE[key]


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: detect → link → canonicalize → triples on the tiny corpus,
    then top compounds by distinct-repo spread (SURVEY §7 M1)."""
    triples = _pipeline_outputs(spark, "tiny")["triples"]
    return (
        triples.filter(F.col("pred") == "foundInRepo")
        .groupBy(F.col("subj").alias("compound"))
        .agg(F.countDistinct("obj").alias("n_repos"))
        .orderBy(F.col("n_repos").desc(), F.col("compound"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# queries: relational operator surface over the driver's sf-dir tables
# --------------------------------------------------------------------------


def q_scan_filter_project(spark, sf_dir):  # B1/B2: pushdown-friendly scan
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1995-06-01")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .orderBy("l_orderkey", "l_partkey", "l_quantity")
        .limit(500)
    )


def q_agg_pricing_summary(spark, sf_dir):  # E1: TPC-H Q1 shape
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_join_broadcast_dim(spark, sf_dir):  # D1: broadcast dim join
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("c_mktsegment")
    )


def q_join_four_way(spark, sf_dir):  # D2: multi-join + agg
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy("n_name")
    )


def q_anti_join(spark, sf_dir):  # D4: customers with no orders
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_semi_join(spark, sf_dir):  # D5: customers with ≥1 order
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


def q_window_topk_per_group(spark, sf_dir):  # F1/G3: top-3 orders per customer
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "rk")
        .orderBy("o_custkey", "rk")
    )


def q_window_running_sum(spark, sf_dir):  # F4: frame aggregate
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
        ).orderBy("o_custkey", "o_orderkey")
    )


def q_window_lag_gap(spark, sf_dir):  # F3: lag sweep
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("gap_days"),
        ).orderBy("o_custkey", "o_orderkey")
    )


def q_distinct_agg(spark, sf_dir):  # E2: distinct per group
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
        .orderBy("l_suppkey")
    )


def q_rollup_counts(spark, sf_dir):  # E6: rollup with grand total
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


def q_union_set(spark, sf_dir):  # H1: unionByName + distinct
    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select("user_id")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    return views.unionByName(clicks).distinct().orderBy("user_id")


def q_set_ops_days(spark, sf_dir):  # H2+H3: INTERSECT then EXCEPT, one plan
    # round 6: the former except_orders (H2) and intersect_users (H3)
    # micro-queries folded into one set-algebra plan over user×day activity
    # — (viewed ∩ clicked) \ purchased — freeing a registry slot for the J4
    # streaming-session oracle, the same deliberate fold as case_when_buckets
    e = _t(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.col("ts")).cast("string").alias("day"), "event_type"
    )
    views = e.filter(F.col("event_type") == "view").select("user_id", "day")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "day")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id", "day")
    return views.intersect(clicks).subtract(buys).orderBy("user_id", "day")


def q_string_funcs(spark, sf_dir):  # I1: string surface over documents
    # (absorbs the former regexp_extract_numbers query — the driver runs at
    # most 50 registered queries, so the I1 surface is one green row)
    d = _t(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            F.length("text").alias("n_chars_calc"),
            F.lower(F.substring("text", 1, 8)).alias("prefix8"),
            F.size(F.split(F.trim("text"), r"\s+")).cast("long").alias("n_tokens"),
            F.size(F.regexp_extract_all("text", F.lit(r"\d+"), 0))
            .cast("long")
            .alias("n_numbers"),
        ).orderBy("doc_id")
    )


# (the former hash_sha256 query was folded out for the 50-query driver
# budget: sha2's driver evidence lives on in kg_sha_invariant — sha256 over
# the corpus scan — and dedup_exact's COUNT(DISTINCT SHA256(text)) oracle)


def q_json_extract(spark, sf_dir):  # I6: JSON in events.props
    e = _t(spark, sf_dir, "events")
    return (
        e.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        ).orderBy("event_id")
    )


def q_date_trunc_counts(spark, sf_dir):  # I3: date/time bucketing
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.to_date(F.date_trunc("day", "ts")).cast("string").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day", "event_type")
    )


def q_math_exprs(spark, sf_dir):  # I4 math scalars + I7 conditional routing
    # I7's when/otherwise evidence folded in here (round 5): the former
    # case_when_buckets micro-query was retired to free a registry slot for
    # the J3 streaming-window oracle — same deliberate fold as date_arith
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_extendedprice") > 0)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.log(F.col("l_extendedprice")), 6).alias("log_price"),
            F.round(F.greatest("l_tax", "l_discount"), 4).alias("max_rate"),
            F.floor(F.col("l_quantity")).cast("long").alias("qty_floor"),
            F.when(F.col("l_extendedprice") > 50000, "high")
            .when(F.col("l_extendedprice") > 10000, "mid")
            .otherwise("low")
            .alias("price_bucket"),
        ).orderBy("l_orderkey", "l_linenumber")
    )


def q_array_hof_norm(spark, sf_dir):  # I5: higher-order functions on arrays
    em = _t(spark, sf_dir, "embeddings")
    return (
        em.select(
            "vec_id",
            F.size("embedding").cast("long").alias("dim"),
            F.round(
                F.aggregate(
                    F.transform("embedding", lambda x: (x * x).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                4,
            ).alias("norm2"),
        ).orderBy("vec_id")
    )


def q_stream_window_counts(spark, sf_dir):  # J3 vs a batch value oracle
    """Event-time tumbling-window streaming aggregation (kgx/streaming/
    incremental.py streamed_window_counts): the events table staged as 4
    files → 2-file microbatches → window('1 day') x event_type counts in
    complete mode; the drained state equals the plain batch
    GROUP BY date_trunc('day', ts) — the DuckDB oracle.  (The former
    case_when_buckets slot; I7 folded into math_exprs.)"""
    import shutil
    import tempfile

    from kgx.streaming.incremental import streamed_window_counts

    work = tempfile.mkdtemp(prefix="kgx_streamw_q_")
    try:
        out = streamed_window_counts(spark, f"{sf_dir}/events.parquet", work)
        return out.orderBy("day", "event_type")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_stream_session_counts(spark, sf_dir):  # J4 vs a batch value oracle
    """Event-time SESSION-window streaming aggregation (kgx/streaming/
    incremental.py streamed_session_counts): the events table staged as 4
    hash-split files → 2-file microbatches → session_window(ts, '4 hours')
    per user in complete mode, so partial sessions genuinely MERGE across
    microbatches in the state store; the drained state equals batch
    gaps-and-islands sessionization (lag → break flag → running-sum session
    id → group) — the DuckDB oracle.  Timestamps emitted as epoch
    microseconds so equality is rendering- and timezone-independent.
    (Slot freed by folding except_orders + intersect_users into
    set_ops_days.)"""
    import shutil
    import tempfile

    from kgx.streaming.incremental import streamed_session_counts

    work = tempfile.mkdtemp(prefix="kgx_streams_q_")
    try:
        out = streamed_session_counts(spark, f"{sf_dir}/events.parquet", work)
        return out.orderBy("user_id", "session_start_us")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_global_sort_limit(spark, sf_dir):  # G1/G2: total-order top-k
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(25)
    )


def q_latest_per_key(spark, sf_dir):  # D7: as-of/latest-version idiom
    # + I3 date arithmetic on the surviving row (absorbs the former
    # date_arith query — 50-query driver budget)
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date(F.date_add(F.col("o_orderdate"), 30)).cast("string").alias("due_date"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
        )
        .orderBy("o_custkey")
    )


def q_range_self_join(spark, sf_dir):  # D6: range/interval self-join
    e = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.ts") < F.col("b.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR")),
    )
    return (
        pairs.groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


def q_salted_groupby(spark, sf_dir):  # D3: two-phase salted aggregation
    e = _t(spark, sf_dir, "events")
    partial = (
        e.withColumn("__salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
        .groupBy("event_type", "__salt")
        .agg(F.sum("value").alias("__s"), F.count(F.lit(1)).alias("__n"))
    )
    return (
        partial.groupBy("event_type")
        .agg(F.round(F.sum("__s"), 2).alias("total_value"), F.sum("__n").alias("n"))
        .orderBy("event_type")
    )


def q_dedup_exact(spark, sf_dir):  # extras: exact dedup by content hash
    d = _t(spark, sf_dir, "documents")
    return (
        d.withColumn("text_sha", F.sha2("text", 256))
        .groupBy("lang")
        .agg(F.countDistinct("text_sha").alias("n_unique_docs"))
        .orderBy("lang")
    )


def q_approx_distinct(spark, sf_dir):  # E3: HLL sketch with a ±5% bound oracle
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("__approx"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    ).select(
        "exact_parts",
        (
            F.abs(F.col("__approx") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.05)
        ).alias("within_5pct"),
    )


# --------------------------------------------------------------------------
# queries: kgx pipeline operators vs golden fixtures (independent oracle)
# --------------------------------------------------------------------------


def q_kg_mentions_by_type(spark, sf_dir):
    m = _pipeline_outputs(spark)["mentions"]
    return m.groupBy("mtype").agg(F.count(F.lit(1)).alias("n")).orderBy("mtype")


def q_kg_mention_spans(spark, sf_dir):
    m = _pipeline_outputs(spark)["mentions"]
    return (
        m.select("repo", "path", "commit", "start", "end")
        .orderBy("repo", "path", "commit", "start", "end")
    )


def q_kg_triples_by_pred(spark, sf_dir):
    t = _pipeline_outputs(spark)["triples"]
    return t.groupBy("pred").agg(F.count(F.lit(1)).alias("n")).orderBy("pred")


def q_kg_triples_full(spark, sf_dir):
    t = _pipeline_outputs(spark)["triples"]
    return t.select("subj", "pred", "obj").orderBy("subj", "pred", "obj")


def q_kg_synonyms_agg(spark, sf_dir):  # E4: collect_set + array_sort synonym fan-in
    t = _pipeline_outputs(spark)["triples"]
    return (
        t.filter(F.col("pred") == "synonymOf")
        .groupBy(F.col("obj").alias("rep"))
        .agg(F.array_join(F.array_sort(F.collect_set("subj")), "|").alias("synonyms"))
        .orderBy("rep")
    )


def q_kg_top_compounds_by_repo_spread(spark, sf_dir):
    t = _pipeline_outputs(spark)["triples"]
    return (
        t.filter(F.col("pred") == "foundInRepo")
        .groupBy(F.col("subj").alias("compound"))
        .agg(F.countDistinct("obj").alias("n_repos"))
        .orderBy(F.col("n_repos").desc(), "compound")
        .limit(10)
    )


def q_kg_sha_invariant(spark, sf_dir):
    from kgx.io.source import scan_source_files

    d = _fixture_dir()
    files = scan_source_files(spark, f"{d}/source_files.parquet")
    return (
        files.select("repo", "path", "commit", "content_sha")
        .orderBy("repo", "path", "commit")
    )


def q_kg_links_by_method(spark, sf_dir):  # value-oracled vs fixture golden_links
    l = _pipeline_outputs(spark)["links"]
    return l.groupBy("method").agg(F.count(F.lit(1)).alias("n")).orderBy("method")


# --------------------------------------------------------------------------
# queries: training-data pipeline extras (kgx.extras)
# --------------------------------------------------------------------------


def q_ann_cosine_topk(spark, sf_dir):  # exact brute-force ANN baseline
    from kgx.extras.similarity import cosine_topk

    em = _t(spark, sf_dir, "embeddings")
    queries_df = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = cosine_topk(em, queries_df, k=5)
    return out.select(
        "query_id", "vec_id", F.round("cosine", 4).alias("cosine"), "rank"
    ).orderBy("query_id", "rank")


def q_ann_lsh_recall(spark, sf_dir):  # LSH recall@5 >= 0.6 per query (value oracle)
    from kgx.extras.similarity import cosine_topk, lsh_cosine_topk

    em = _t(spark, sf_dir, "embeddings")
    queries_df = em.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dim = len(em.select("embedding").first()["embedding"])
    exact = cosine_topk(em, queries_df, k=5).select("query_id", "vec_id")
    approx = lsh_cosine_topk(em, queries_df, dim=dim, k=5, n_tables=8).select(
        "query_id", "vec_id", F.lit(1).alias("__hit")
    )
    # left join keeps queries even at zero hits (a left_semi would silently
    # drop them and fake a row-count match failure into a pass)
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg((F.sum(F.coalesce("__hit", F.lit(0))) >= F.lit(3)).alias("recall_ok"))
        .orderBy("query_id")
    )


def q_text_token_counts(spark, sf_dir):
    from kgx.extras.textstats import token_counts

    d = _t(spark, sf_dir, "documents")
    return (
        token_counts(d)
        .groupBy("lang")
        .agg(
            F.sum("n_ws_tokens").alias("ws_tokens"),
            F.sum("n_bpe_pieces").alias("bpe_pieces"),
        )
        .orderBy("lang")
    )


def q_text_quality(spark, sf_dir):
    from kgx.extras.textstats import quality_scores

    d = _t(spark, sf_dir, "documents")
    return (
        quality_scores(d)
        .groupBy("lang")
        .agg(
            F.round(F.avg("alpha_ratio"), 4).alias("avg_alpha"),
            F.round(F.avg("quality_score"), 4).alias("avg_quality"),
        )
        .orderBy("lang")
    )


def q_text_lang_id(spark, sf_dir):  # heuristic language id vs labeled lang
    from kgx.extras.textstats import language_id

    d = _t(spark, sf_dir, "documents")
    return (
        language_id(d)
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


def q_text_fingerprint(spark, sf_dir):
    from kgx.extras.textstats import fingerprint

    d = _t(spark, sf_dir, "documents")
    return fingerprint(d).select("doc_id", "fp_sha").orderBy("doc_id")


def q_dedup_minhash_docs(spark, sf_dir):  # planted near+exact dups (value oracle)
    from kgx.extras.dedup import minhash_dedup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select("doc_id", "text")
    # plant one NEAR duplicate (tiny tail edit, Jaccard ≈ 0.97) per 25th doc
    # and one EXACT duplicate per (25th+13) doc; the oracle-checkable
    # invariant is that every planted doc lands in its source's cluster,
    # regardless of the organic near-dup structure of the corpus
    near = d.filter((F.col("doc_id") % 25) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat("text", F.lit(" q")).alias("text"),
    )
    exact = d.filter((F.col("doc_id") % 25) == 13).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    clusters = minhash_dedup(
        d.unionByName(near).unionByName(exact), "text", "doc_id", jaccard_threshold=0.8
    )
    src_of = F.when(F.col("doc_id") >= 200000, F.col("doc_id") - 200000).otherwise(
        F.col("doc_id") - 100000
    )
    planted = clusters.filter(F.col("doc_id") >= 100000).select(
        "doc_id", src_of.alias("__src"), F.col("cluster_id").alias("__pc")
    )
    srcs = clusters.select(F.col("doc_id").alias("__src"), F.col("cluster_id").alias("__sc"))
    return (
        planted.join(srcs, "__src")
        .select("doc_id", (F.col("__pc") == F.col("__sc")).alias("same_cluster"))
        .orderBy("doc_id")
    )


def q_dedup_simhash_docs(spark, sf_dir):  # planted simhash dups (value oracle)
    from kgx.extras.dedup import simhash_dedup

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 500).select("doc_id", "text")
    # plant one CASE-variant duplicate (different bytes -> survives the
    # exact sha pre-pass; identical lowercased tokens -> simhash Hamming 0,
    # found only through the chunk-band LSH path) per 25th doc, and one
    # EXACT byte duplicate per (25th+13) doc (collapsed by the pre-pass).
    # Oracle-checkable invariant: every planted doc lands in its source's
    # cluster, regardless of the corpus' organic near-dup structure.
    near = d.filter((F.col("doc_id") % 25) == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    exact = d.filter((F.col("doc_id") % 25) == 13).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    clusters = simhash_dedup(d.unionByName(near).unionByName(exact), "text", "doc_id")
    src_of = F.when(F.col("doc_id") >= 200000, F.col("doc_id") - 200000).otherwise(
        F.col("doc_id") - 100000
    )
    planted = clusters.filter(F.col("doc_id") >= 100000).select(
        "doc_id", src_of.alias("__src"), F.col("cluster_id").alias("__pc")
    )
    srcs = clusters.select(F.col("doc_id").alias("__src"), F.col("cluster_id").alias("__sc"))
    return (
        planted.join(srcs, "__src")
        .select("doc_id", (F.col("__pc") == F.col("__sc")).alias("same_cluster"))
        .orderBy("doc_id")
    )


def q_dedup_embedding_docs(spark, sf_dir):  # planted cosine dups (value oracle)
    from kgx.extras.dedup import embedding_dedup

    em = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # plant one SCALED duplicate (x1.02 per component: different bytes ->
    # survives the exact digest pre-pass; cosine exactly 1 and identical
    # hyperplane sign pattern -> found through the LSH + verify path) per
    # 25th vector, and one EXACT copy per (25th+13) vector (collapsed by
    # the pre-pass).  Oracle-checkable invariant: every planted vector
    # lands in its source's cluster.
    scaled = em.filter((F.col("vec_id") % 25) == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(1.02)).cast("float")).alias("embedding"),
    )
    exact = em.filter((F.col("vec_id") % 25) == 13).select(
        (F.col("vec_id") + 200000).alias("vec_id"), "embedding"
    )
    clusters = embedding_dedup(
        em.unionByName(scaled).unionByName(exact), "embedding", "vec_id", dim=64
    )
    src_of = F.when(F.col("vec_id") >= 200000, F.col("vec_id") - 200000).otherwise(
        F.col("vec_id") - 100000
    )
    planted = clusters.filter(F.col("vec_id") >= 100000).select(
        "vec_id", src_of.alias("__src"), F.col("cluster_id").alias("__pc")
    )
    srcs = clusters.select(F.col("vec_id").alias("__src"), F.col("cluster_id").alias("__sc"))
    return (
        planted.join(srcs, "__src")
        .select("vec_id", (F.col("__pc") == F.col("__sc")).alias("same_cluster"))
        .orderBy("vec_id")
    )


def q_cube_revenue(spark, sf_dir):  # E6: cube (all grouping sets)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


def q_pivot_status(spark, sf_dir):  # pivot (conditional aggregation)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")
    )


def q_levenshtein_names(spark, sf_dir):  # I1: built-in edit distance
    p = _t(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.levenshtein(F.col("p_name"), F.col("p_type")).alias("name_type_dist"),
        ).orderBy("p_partkey")
    )


def q_zip_with_dot(spark, sf_dir):  # I5: zip_with + reverse + aggregate
    em = _t(spark, sf_dir, "embeddings")
    dot = F.aggregate(
        F.zip_with("embedding", F.reverse(F.col("embedding")), lambda a, b: (a * b).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return em.select("vec_id", F.round(dot, 4).alias("self_rev_dot")).orderBy("vec_id")


def q_percentiles(spark, sf_dir):  # exact percentile agg
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 2).alias("p90"),
    ).orderBy("o_orderpriority")


def q_stream_dedup_counts(spark, sf_dir):  # J1+J2+J5 vs a batch value oracle
    """File-source stream of the events table staged as TWO complete file
    sets → watermark + cross-batch dropDuplicates on event_id → foreachBatch
    upsert of per-type counts (kgx/streaming/incremental.py
    streamed_dedup_counts).  event_id is unique in the batch table, so the
    deduped streamed total equals the plain batch GROUP BY — the DuckDB
    oracle."""
    import shutil
    import tempfile

    from kgx.streaming.incremental import streamed_dedup_counts

    work = tempfile.mkdtemp(prefix="kgx_stream_q_")
    try:
        out = streamed_dedup_counts(spark, f"{sf_dir}/events.parquet", work)
        # pin the (tiny: one row per event_type) result into block storage so
        # the work dir — staged copies + state parquet — can be deleted now
        # instead of leaking a full staged table per bench/correctness run
        return out.select("event_type", "n").orderBy("event_type").localCheckpoint()
    finally:
        shutil.rmtree(work, ignore_errors=True)


def q_multimodal_features(spark, sf_dir):  # value-oracled vs precomputed expected features
    from kgx.extras.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, 64)
    feats = extract_features(media)
    return (
        feats.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum(F.element_at("feature", 1)), 4).alias("f0_sum"),
        )
        .orderBy("kind")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    qs = {
        "scan_filter_project": q_scan_filter_project,
        "agg_pricing_summary": q_agg_pricing_summary,
        "join_broadcast_dim": q_join_broadcast_dim,
        "join_four_way": q_join_four_way,
        "anti_join": q_anti_join,
        "semi_join": q_semi_join,
        "window_topk_per_group": q_window_topk_per_group,
        "window_running_sum": q_window_running_sum,
        "window_lag_gap": q_window_lag_gap,
        "distinct_agg": q_distinct_agg,
        "rollup_counts": q_rollup_counts,
        "union_set": q_union_set,
        "set_ops_days": q_set_ops_days,
        "stream_session_counts": q_stream_session_counts,
        "string_funcs": q_string_funcs,
        "json_extract": q_json_extract,
        "date_trunc_counts": q_date_trunc_counts,
        "math_exprs": q_math_exprs,
        "array_hof_norm": q_array_hof_norm,
        "stream_window_counts": q_stream_window_counts,
        "global_sort_limit": q_global_sort_limit,
        "latest_per_key": q_latest_per_key,
        "range_self_join": q_range_self_join,
        "salted_groupby": q_salted_groupby,
        "dedup_exact": q_dedup_exact,
        "approx_distinct": q_approx_distinct,
        "kg_mentions_by_type": q_kg_mentions_by_type,
        "kg_mention_spans": q_kg_mention_spans,
        "kg_triples_by_pred": q_kg_triples_by_pred,
        "kg_triples_full": q_kg_triples_full,
        "kg_synonyms_agg": q_kg_synonyms_agg,
        "kg_top_compounds_by_repo_spread": q_kg_top_compounds_by_repo_spread,
        "kg_sha_invariant": q_kg_sha_invariant,
        "kg_links_by_method": q_kg_links_by_method,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_recall": q_ann_lsh_recall,
        "text_token_counts": q_text_token_counts,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "dedup_minhash_docs": q_dedup_minhash_docs,
        "dedup_simhash_docs": q_dedup_simhash_docs,
        "dedup_embedding_docs": q_dedup_embedding_docs,
        "multimodal_features": q_multimodal_features,
        "cube_revenue": q_cube_revenue,
        "pivot_status": q_pivot_status,
        "levenshtein_names": q_levenshtein_names,
        "zip_with_dot": q_zip_with_dot,
        "percentiles": q_percentiles,
        "stream_dedup_counts": q_stream_dedup_counts,
    }
    # exactly 50 entries, deliberately: the round-3 driver ran 50 of 51
    # registered queries (date_arith silently lost its green row), so the
    # registry is kept at the observed budget — regexp_extract_numbers
    # folded into string_funcs, date_arith into latest_per_key, (round 5)
    # case_when_buckets into math_exprs to free the slot for the J3
    # streaming-window oracle, and (round 6) except_orders +
    # intersect_users into set_ops_days to free the slot for the J4
    # streaming-session oracle (stream_session_counts)
    assert len(qs) == 50, f"driver runs at most 50 queries, got {len(qs)}"
    # every callable ships kgx to the python workers first (cwd-independent)
    return {name: _shipped(fn) for name, fn in qs.items()}


def _fx(name: str) -> str:
    return f"read_parquet('{FIXTURE_BASE}/tiny/{name}.parquet')"


def oracle_sql() -> dict[str, str]:
    golden_triples = _fx("golden_triples")
    golden_mentions = _fx("golden_mentions")
    manifest = _fx("manifest")
    return {
        "scan_filter_project": """
            SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1995-06-01'
            ORDER BY l_orderkey, l_partkey, l_quantity LIMIT 500
        """,
        "agg_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(CAST(SUM(l_quantity) AS DOUBLE), 2) AS sum_qty,
                   ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_broadcast_dim": """
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   ROUND(CAST(SUM(o_totalprice) AS DOUBLE), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "join_four_way": """
            SELECT n_name,
                   ROUND(CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE), 2) AS revenue
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
            ORDER BY c_custkey
        """,
        "window_topk_per_group": """
            SELECT o_custkey, o_orderkey, rk FROM (
              SELECT o_custkey, o_orderkey,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_totalprice DESC, o_orderkey) AS rk
              FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk
        """,
        "window_running_sum": """
            SELECT o_custkey, o_orderkey,
                   ROUND(CAST(SUM(o_totalprice) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
                   AS running_total
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "window_lag_gap": """
            SELECT o_custkey, o_orderkey,
                   CAST(DATE_DIFF('day',
                        LAG(o_orderdate) OVER (PARTITION BY o_custkey
                                               ORDER BY o_orderdate, o_orderkey),
                        o_orderdate) AS INT) AS gap_days
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "distinct_agg": """
            SELECT l_suppkey, COUNT(DISTINCT l_partkey) AS n_parts
            FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "rollup_counts": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "union_set": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'view'
              UNION ALL
              SELECT user_id FROM events WHERE event_type = 'click')
            ORDER BY user_id
        """,
        "set_ops_days": """
            SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
            FROM events WHERE event_type = 'view'
            INTERSECT
            SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
            FROM events WHERE event_type = 'click'
            EXCEPT
            SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day
            FROM events WHERE event_type = 'purchase'
            ORDER BY user_id, day
        """,
        "string_funcs": r"""
            SELECT doc_id, CAST(LENGTH(text) AS INT) AS n_chars_calc,
                   LOWER(SUBSTRING(text, 1, 8)) AS prefix8,
                   CAST(LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT) AS n_tokens,
                   CAST(LEN(REGEXP_EXTRACT_ALL(text, '\d+')) AS BIGINT) AS n_numbers
            FROM documents ORDER BY doc_id
        """,
        "json_extract": """
            SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
            FROM events ORDER BY event_id
        """,
        "date_trunc_counts": """
            SELECT CAST(CAST(DATE_TRUNC('day', ts) AS DATE) AS VARCHAR) AS day,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        "math_exprs": """
            SELECT l_orderkey, l_linenumber,
                   ROUND(LN(l_extendedprice), 6) AS log_price,
                   ROUND(GREATEST(l_tax, l_discount), 4) AS max_rate,
                   CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
                   CASE WHEN l_extendedprice > 50000 THEN 'high'
                        WHEN l_extendedprice > 10000 THEN 'mid'
                        ELSE 'low' END AS price_bucket
            FROM lineitem WHERE l_extendedprice > 0
            ORDER BY l_orderkey, l_linenumber
        """,
        "array_hof_norm": """
            SELECT vec_id, CAST(LEN(embedding) AS BIGINT) AS dim,
                   ROUND(CAST(LIST_SUM(LIST_TRANSFORM(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS DOUBLE), 4) AS norm2
            FROM embeddings ORDER BY vec_id
        """,
        "stream_window_counts": """
            SELECT CAST(CAST(DATE_TRUNC('day', ts) AS DATE) AS VARCHAR) AS day,
                   event_type, COUNT(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY day, event_type
        """,
        # session_window merge semantics (verified empirically: diff == gap
        # MERGES, a new session starts strictly after the gap; emitted
        # window is [min_ts, max_ts + gap)) as classic gaps-and-islands:
        # lag -> strict-gap break flag -> running-sum session id -> group
        "stream_session_counts": """
            WITH brk AS (
                SELECT user_id, ts,
                       CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                 > INTERVAL 4 HOUR
                            THEN 1 ELSE 0 END AS is_break
                FROM events
            ), sess AS (
                SELECT user_id, ts,
                       SUM(is_break) OVER (PARTITION BY user_id ORDER BY ts
                                           ROWS UNBOUNDED PRECEDING) AS session_id
                FROM brk
            )
            SELECT user_id,
                   EPOCH_US(MIN(ts)) AS session_start_us,
                   EPOCH_US(MAX(ts) + INTERVAL 4 HOUR) AS session_end_us,
                   COUNT(*) AS n_events
            FROM sess
            GROUP BY user_id, session_id
            ORDER BY user_id, session_start_us
        """,
        "global_sort_limit": """
            SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25
        """,
        "latest_per_key": """
            SELECT o_custkey, o_orderkey,
                   CAST(CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS VARCHAR) AS due_date,
                   CAST(YEAR(o_orderdate) AS INT) AS yr,
                   CAST(MONTH(o_orderdate) AS INT) AS mo
            FROM (
              SELECT o_custkey, o_orderkey, o_orderdate,
                     ROW_NUMBER() OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
              FROM orders) WHERE rn = 1 ORDER BY o_custkey
        """,
        "range_self_join": """
            SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND a.ts < b.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
            GROUP BY a.user_id ORDER BY user_id
        """,
        "salted_groupby": """
            SELECT event_type, ROUND(CAST(SUM(value) AS DOUBLE), 2) AS total_value,
                   COUNT(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "dedup_exact": """
            SELECT lang, COUNT(DISTINCT SHA256(text)) AS n_unique_docs
            FROM documents GROUP BY lang ORDER BY lang
        """,
        # approx_distinct: the HLL estimate itself is a sketch, so the
        # checkable contract is the ±5% bound against the exact count
        "approx_distinct": """
            SELECT COUNT(DISTINCT l_partkey) AS exact_parts, TRUE AS within_5pct
            FROM lineitem
        """,
        "kg_mentions_by_type": f"""
            SELECT mtype, COUNT(*) AS n FROM {golden_mentions}
            GROUP BY mtype ORDER BY mtype
        """,
        "kg_mention_spans": f"""
            SELECT repo, path, commit, start, "end" FROM {golden_mentions}
            ORDER BY repo, path, commit, start, "end"
        """,
        "kg_triples_by_pred": f"""
            SELECT pred, COUNT(*) AS n FROM {golden_triples} GROUP BY pred ORDER BY pred
        """,
        "kg_triples_full": f"""
            SELECT subj, pred, obj FROM {golden_triples} ORDER BY subj, pred, obj
        """,
        "kg_top_compounds_by_repo_spread": f"""
            SELECT subj AS compound, COUNT(DISTINCT obj) AS n_repos
            FROM {golden_triples} WHERE pred = 'foundInRepo'
            GROUP BY subj ORDER BY n_repos DESC, compound LIMIT 10
        """,
        "kg_sha_invariant": f"""
            SELECT repo, path, commit, content_sha FROM {manifest}
            ORDER BY repo, path, commit
        """,
        "kg_links_by_method": f"""
            SELECT method, COUNT(*) AS n FROM {_fx("golden_links")}
            GROUP BY method ORDER BY method
        """,
        "kg_synonyms_agg": f"""
            SELECT obj AS rep,
                   ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT subj)), '|') AS synonyms
            FROM {_fx("golden_triples")} WHERE pred = 'synonymOf'
            GROUP BY obj ORDER BY rep
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qv
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     CAST(list_cosine_similarity(e.embedding, q.qv) AS DOUBLE) AS cos
              FROM embeddings e CROSS JOIN q),
            ranked AS (
              SELECT query_id, vec_id, cos,
                     ROW_NUMBER() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, vec_id) AS rank
              FROM scored)
            SELECT query_id, vec_id, ROUND(cos, 4) AS cosine, rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        # ann_lsh_recall: the bucket structure is not SQL, but the recall
        # floor (>= 3 of 5 exact neighbors recovered, per query) is
        "ann_lsh_recall": """
            SELECT vec_id AS query_id, TRUE AS recall_ok
            FROM embeddings WHERE vec_id < 3 ORDER BY query_id
        """,
        "text_token_counts": r"""
            SELECT lang,
                   CAST(SUM(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+'))) AS BIGINT)
                       AS ws_tokens,
                   CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT) AS bpe_pieces
            FROM documents GROUP BY lang ORDER BY lang
        """,
        "text_quality": r"""
            WITH f AS (
              SELECT lang,
                     CAST(LENGTH(text) AS DOUBLE) AS n,
                     CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
                     CAST(LENGTH(REGEXP_REPLACE(text, '[^.,;:!?''"()\[\]{}]', '', 'g')) AS DOUBLE) AS n_punct,
                     CAST(LENGTH(REGEXP_REPLACE(text, '[^A-Z]', '', 'g')) AS DOUBLE) AS n_upper
              FROM documents),
            g AS (
              SELECT lang,
                     ROUND(n_alpha / CASE WHEN n > 0 THEN n ELSE 1 END, 6) AS alpha_ratio,
                     ROUND(LEAST(n / 2000.0, 1.0) * 0.25
                       + (n_alpha / CASE WHEN n > 0 THEN n ELSE 1 END) * 0.45
                       + (1.0 - LEAST(n_punct / CASE WHEN n > 0 THEN n ELSE 1 END * 5.0, 1.0)) * 0.15
                       + (1.0 - LEAST(n_upper / CASE WHEN n > 0 THEN n ELSE 1 END * 5.0, 1.0)) * 0.15,
                       6) AS quality_score
              FROM f)
            SELECT lang, ROUND(AVG(alpha_ratio), 4) AS avg_alpha,
                   ROUND(AVG(quality_score), 4) AS avg_quality
            FROM g GROUP BY lang ORDER BY lang
        """,
        "text_lang_id": r"""
            WITH toks AS (
              SELECT lang, LIST_TRANSFORM(
                       REGEXP_SPLIT_TO_ARRAY(LOWER(text), '\s+'),
                       t -> REGEXP_REPLACE(t, '[^\p{L}]', '', 'g')) AS tk
              FROM documents),
            s AS (
              SELECT lang,
                LEN(LIST_INTERSECT(tk, ['the','and','of','to','in','is','it','that','for','with'])) AS s_en,
                LEN(LIST_INTERSECT(tk, ['der','die','das','und','ist','nicht','ein','mit','für','auf'])) AS s_de,
                LEN(LIST_INTERSECT(tk, ['el','la','de','que','y','en','un','es','por','con'])) AS s_es,
                LEN(LIST_INTERSECT(tk, ['le','la','de','et','un','est','pour','que','dans','avec'])) AS s_fr,
                LEN(LIST_INTERSECT(tk, ['的','是','在','了','和','有','我','不','这','人'])) AS s_zh
              FROM toks),
            p AS (
              SELECT lang,
                     CASE WHEN GREATEST(s_en,s_de,s_es,s_fr,s_zh) = 0 THEN 'unknown'
                          WHEN s_en = GREATEST(s_en,s_de,s_es,s_fr,s_zh) THEN 'en'
                          WHEN s_de = GREATEST(s_en,s_de,s_es,s_fr,s_zh) THEN 'de'
                          WHEN s_es = GREATEST(s_en,s_de,s_es,s_fr,s_zh) THEN 'es'
                          WHEN s_fr = GREATEST(s_en,s_de,s_es,s_fr,s_zh) THEN 'fr'
                          ELSE 'zh' END AS lang_pred
              FROM s)
            SELECT lang, lang_pred, COUNT(*) AS n FROM p
            GROUP BY lang, lang_pred ORDER BY lang, lang_pred
        """,
        "text_fingerprint": r"""
            SELECT doc_id,
                   SHA256(REGEXP_REPLACE(LOWER(TRIM(text)), '\s+', ' ', 'g')) AS fp_sha
            FROM documents ORDER BY doc_id
        """,
        # dedup_minhash_docs: LSH clustering is not SQL, but the planted
        # invariant — every planted near/exact duplicate clusters with its
        # source doc — is
        "dedup_minhash_docs": """
            SELECT doc_id + 100000 AS doc_id, TRUE AS same_cluster
            FROM documents WHERE doc_id < 500 AND doc_id % 25 = 0
            UNION ALL
            SELECT doc_id + 200000 AS doc_id, TRUE AS same_cluster
            FROM documents WHERE doc_id < 500 AND doc_id % 25 = 13
            ORDER BY doc_id
        """,
        # multimodal_features: the fake codecs are deterministic, so the
        # expected per-kind aggregate is precomputed in pure Python at
        # fixture-generation time (kgx/fixtures/gen.py
        # expected_multimodal_features) — the oracle hash-compares the real
        # mapInPandas/Arrow-binary plumbing end-to-end
        "multimodal_features": f"""
            SELECT kind, n, total_bytes, f0_sum
            FROM {_fx('multimodal_expected')} ORDER BY kind
        """,
        # dedup_embedding_docs: same planted-invariant shape as minhash
        "dedup_embedding_docs": """
            SELECT vec_id + 100000 AS vec_id, TRUE AS same_cluster
            FROM embeddings WHERE vec_id % 25 = 0
            UNION ALL
            SELECT vec_id + 200000 AS vec_id, TRUE AS same_cluster
            FROM embeddings WHERE vec_id % 25 = 13
            ORDER BY vec_id
        """,
        # dedup_simhash_docs: same planted-invariant shape as minhash
        "dedup_simhash_docs": """
            SELECT doc_id + 100000 AS doc_id, TRUE AS same_cluster
            FROM documents WHERE doc_id < 500 AND doc_id % 25 = 0
            UNION ALL
            SELECT doc_id + 200000 AS doc_id, TRUE AS same_cluster
            FROM documents WHERE doc_id < 500 AND doc_id % 25 = 13
            ORDER BY doc_id
        """,
        "cube_revenue": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(CAST(SUM(l_extendedprice) AS DOUBLE), 2) AS revenue
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """,
        "pivot_status": """
            SELECT l_returnflag,
                   ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS DOUBLE), 2) AS qty_f,
                   ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS DOUBLE), 2) AS qty_o
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "levenshtein_names": """
            SELECT p_partkey, CAST(LEVENSHTEIN(p_name, p_type) AS INT) AS name_type_dist
            FROM part ORDER BY p_partkey
        """,
        "zip_with_dot": """
            SELECT vec_id,
                   ROUND(CAST(LIST_SUM(LIST_TRANSFORM(
                       LIST_ZIP(embedding, LIST_REVERSE(embedding)),
                       p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))) AS DOUBLE), 4)
                   AS self_rev_dot
            FROM embeddings ORDER BY vec_id
        """,
        "percentiles": """
            SELECT o_orderpriority,
                   ROUND(CAST(QUANTILE_CONT(o_totalprice, 0.5) AS DOUBLE), 2) AS p50,
                   ROUND(CAST(QUANTILE_CONT(o_totalprice, 0.9) AS DOUBLE), 2) AS p90
            FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        # stream_dedup_counts: the staged-duplicate stream dedups back to the
        # batch table (event_id unique), so the upserted final state equals
        # the plain batch aggregate
        "stream_dedup_counts": """
            SELECT event_type, COUNT(*) AS n FROM events
            GROUP BY event_type ORDER BY event_type
        """,
    }
