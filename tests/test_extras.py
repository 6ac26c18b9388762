"""Training-data pipeline extras: dedup, similarity search, text analysis,
multimodal plumbing (first-class components beyond the reference surface)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- dedup ------------------------------------------------------------------


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("quick", "quik")),  # near dup of 0
        (3, "completely different text about spark shuffle partitions and joins"),
        (4, "completely different text about spark shuffle partitions and joins!!"),  # near dup of 3
        (5, "unrelated short snippet"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    from kgx.extras.dedup import exact_dedup

    out = exact_dedup(_docs(spark), "text", "doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["dup_group"] == by_id[1]["dup_group"]
    assert by_id[0]["is_canonical"] and not by_id[1]["is_canonical"]
    assert by_id[2]["dup_group"] != by_id[0]["dup_group"]


def test_minhash_dedup_clusters_near_dups(spark):
    from kgx.extras.dedup import minhash_dedup

    out = {r["doc_id"]: r["cluster_id"] for r in minhash_dedup(_docs(spark), "text", "doc_id").collect()}
    assert out[0] == out[1] == out[2]  # exact + near dup cluster
    assert out[3] == out[4]
    assert out[0] != out[3]
    assert out[5] not in (out[0], out[3])


def test_minhash_dedup_matches_allpairs_reference(spark):
    """The star-edge plan (O(m) edges/bucket) must produce the same clusters
    as the round-1 all-pairs-within-bucket plan on realistic inputs."""
    from kgx.canon.cc import connected_components
    from kgx.extras.dedup import minhash_dedup
    from kgx.link.minhash import fuzzy_jaccard, minhash_bands_udf
    import pandas as pd
    from pyspark.sql import types as T

    def allpairs_reference(df, text_col, id_col, jaccard_threshold=0.7):
        # verbatim round-1 shape: band self-join with id<id, pairwise verify
        ids = df.select(F.col(id_col).cast("long").alias("__id"), F.col(text_col).alias("__text"))
        bands = ids.withColumn("__bands", minhash_bands_udf(F.col("__text"))).select(
            "__id", "__text", F.posexplode("__bands").alias("band_id", "band_hash")
        )
        a, b = bands.alias("a"), bands.alias("b")
        pairs = (
            a.join(
                b,
                on=[
                    F.col("a.band_id") == F.col("b.band_id"),
                    F.col("a.band_hash") == F.col("b.band_hash"),
                    F.col("a.__id") < F.col("b.__id"),
                ],
            )
            .select(
                F.col("a.__id").alias("src"),
                F.col("b.__id").alias("dst"),
                F.col("a.__text").alias("__ta"),
                F.col("b.__text").alias("__tb"),
            )
            .dropDuplicates(["src", "dst"])
        )

        @F.pandas_udf(T.DoubleType())
        def _jac(ta: pd.Series, tb: pd.Series) -> pd.Series:
            return pd.Series([fuzzy_jaccard(x or "", y or "") for x, y in zip(ta, tb)])

        verified = (
            pairs.withColumn("__j", _jac("__ta", "__tb"))
            .filter(F.col("__j") >= jaccard_threshold)
            .select("src", "dst")
        )
        comps = connected_components(verified)
        clusters = comps.select(
            F.col("node_id").alias("__id"), F.col("component_id").alias("cluster_id")
        )
        return (
            ids.select("__id")
            .join(clusters, "__id", "left")
            .select(
                F.col("__id").alias(id_col),
                F.coalesce("cluster_id", F.col("__id")).alias("cluster_id"),
            )
        )

    # planted clusters of several sizes + exact dups + unrelated docs
    words = "spark shuffle partition join window filter agg scan batch stream".split()
    rng = np.random.RandomState(3)
    rows, did = [], 0
    for c in range(8):
        base = " ".join(rng.choice(words, size=30))
        for v in range(c % 4 + 1):  # cluster sizes 1..4
            t = base if v == 0 else base + f" tail{v}"
            rows.append((did, t))
            did += 1
        rows.append((did, base))  # exact dup of the base
        did += 1
    new = {r["doc_id"]: r["cluster_id"]
           for r in minhash_dedup(spark.createDataFrame(rows, "doc_id long, text string"), "text", "doc_id").collect()}
    old = {r["doc_id"]: r["cluster_id"]
           for r in allpairs_reference(spark.createDataFrame(rows, "doc_id long, text string"), "text", "doc_id").collect()}
    assert new == old


def test_simhash_batch_matches_rowwise_reference():
    """batch_simhash (numpy bit matrix) == the per-row round-1 kernel,
    including empty strings at the start / middle / end of a batch."""
    import zlib

    from kgx.extras.dedup import batch_simhash

    def one(s: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        for tok in (s or "").lower().split():
            h = zlib.crc32(tok.encode("utf-8"))
            h = (h << 32) | zlib.crc32(tok[::-1].encode("utf-8"))
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out - (1 << 64) if out >= (1 << 63) else out

    texts = [
        "",
        "the quick brown fox",
        "",
        "one",
        "spark shuffle partition join window " * 20,
        "MIXED Case Tokens Here",
        "",
    ]
    got = batch_simhash(texts)
    assert got.tolist() == [one(t) for t in texts]
    assert batch_simhash([]).tolist() == []
    assert batch_simhash(["", ""]).tolist() == [0, 0]


def test_simhash_dedup_clusters(spark):
    from kgx.extras.dedup import simhash_dedup

    out = {r["doc_id"]: r["cluster_id"] for r in simhash_dedup(_docs(spark), "text", "doc_id").collect()}
    assert out[0] == out[1]  # identical -> hamming 0 -> same cluster
    assert out[0] != out[3]
    assert out[5] not in (out[0], out[3])


def test_simhash_dedup_matches_allpairs_reference(spark):
    """Hybrid small-all-pairs/star candidate plan + CC must equal the
    connected components of the round-2 exhaustive pair set (all-pairs
    within chunk buckets, Hamming <= 3 — complete by pigeonhole) on a
    corpus with planted near-dup clusters and exact dups."""
    import networkx as nx

    from kgx.extras.dedup import batch_simhash, simhash_dedup

    words = "spark shuffle partition join window filter agg scan batch stream".split()
    rng = np.random.RandomState(11)
    rows, did = [], 0
    for c in range(10):
        base = " ".join(rng.choice(words, size=40))
        for v in range(c % 4 + 1):  # near dups: one token appended
            t = base if v == 0 else base + f" t{v}"
            rows.append((did, t))
            did += 1
        rows.append((did, base))  # exact dup
        did += 1

    # reference: exhaustive Hamming<=3 pairs over the raw simhashes + CC
    hashes = batch_simhash([t for _, t in rows])
    g = nx.Graph()
    g.add_nodes_from(i for i, _ in rows)
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if bin((int(hashes[i]) ^ int(hashes[j])) & (2**64 - 1)).count("1") <= 3:
                g.add_edge(rows[i][0], rows[j][0])
    ref = {}
    for comp in nx.connected_components(g):
        root = min(comp)
        for n in comp:
            ref[n] = root

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in simhash_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"), "text", "doc_id"
        ).collect()
    }
    assert got == ref


def test_batch_jaccard_matches_rowwise_reference():
    """batch_jaccard (interned grams + one lexsort per chunk) == per-pair
    set-based fuzzy_jaccard, including empty strings and repeated roots."""
    from kgx.extras.dedup import batch_jaccard
    from kgx.link.minhash import fuzzy_jaccard

    ta = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog",
        "",
        "alpha beta gamma",
        "short",
        "",
    ]
    tb = [
        "the quick brown fox jumps over the lazy cat",
        "the quick brown fox jumps over the lazy dog",
        "nonempty other side",
        "alpha beta delta epsilon",
        "shorts",
        "",
    ]
    got = batch_jaccard(ta, tb)
    want = [fuzzy_jaccard(a, b) for a, b in zip(ta, tb)]
    assert np.allclose(got, want)
    assert batch_jaccard([], []).size == 0


def test_batch_jaccard_chunking():
    """Sub-chunked path (tiny element budget) == unchunked result."""
    import kgx.extras.dedup as dd

    ta = ["alpha beta gamma delta " * 5] * 7 + ["x y z"]
    tb = ["alpha beta gamma epsilon " * 5] * 7 + ["x y w"]
    full = dd.batch_jaccard(ta, tb)
    old = dd._JACCARD_CHUNK_ELEMS
    try:
        dd._JACCARD_CHUNK_ELEMS = 1  # force one pair per chunk
        chunked = dd.batch_jaccard(ta, tb)
    finally:
        dd._JACCARD_CHUNK_ELEMS = old
    assert np.allclose(full, chunked)


# --- similarity search -------------------------------------------------------


@pytest.fixture(scope="module")
def vectors(spark):
    # clustered vectors (realistic embedding structure): 10 centers + noise
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(10, 16))
    vecs = np.vstack([c + 0.15 * rng.normal(size=(10, 16)) for c in centers]).astype("float32")
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, v.tolist()) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_cosine_topk_matches_numpy(spark, vectors):
    from kgx.extras.similarity import cosine_topk

    df, vecs = vectors
    queries = df.filter(F.col("vec_id") < 2).select(F.col("vec_id").alias("query_id"), "embedding")
    got = cosine_topk(df, queries, k=3)
    by_q = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    sims = vecs @ vecs[:2].T  # (100, 2)
    for q in (0, 1):
        expect = list(np.argsort(-sims[:, q])[:3])
        gotq = [v for _, v in sorted(by_q[q])]
        assert gotq == expect, (q, gotq, expect)


def test_lsh_cosine_recall(spark, vectors):
    from kgx.extras.similarity import cosine_topk, lsh_cosine_topk

    df, _ = vectors
    queries = df.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r["query_id"], r["vec_id"]) for r in cosine_topk(df, queries, k=3).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in lsh_cosine_topk(df, queries, dim=16, k=3, n_tables=12).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.66, recall  # self-match alone gives 1/3; buckets must add signal


def test_lsh_signature_batch_matches_rowwise_reference(spark, vectors):
    """The batched einsum signature == the per-row round-1 computation."""
    from kgx.extras.similarity import _HYPERPLANE_BITS, _signature_udf

    df, vecs = vectors
    sig = _signature_udf(dim=16, n_tables=4)
    got = {
        r["vec_id"]: r["s"]
        for r in df.select("vec_id", sig(F.col("embedding")).alias("s")).collect()
    }
    rs = np.random.RandomState(42)
    planes = rs.normal(size=(4, _HYPERPLANE_BITS, 16)).astype(np.float64)
    for i, v in enumerate(vecs):
        bits = (np.einsum("tbd,d->tb", planes, v.astype(np.float64)) > 0).astype(np.int64)
        expect = [int((row * (1 << np.arange(_HYPERPLANE_BITS))).sum()) for row in bits]
        assert got[i] == expect, i


# --- text analysis -----------------------------------------------------------


def test_language_id_and_quality(spark):
    from kgx.extras.textstats import language_id, quality_scores, token_counts

    rows = [
        (0, "the cat and the dog sat in the garden for an hour"),
        (1, "der Hund und die Katze sind nicht ein Problem für uns"),
        (2, "el perro y la casa es un lugar que está en la ciudad"),
        (3, "!!! ??? ## 12345 (((...)))"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()}
    assert langs[0] == "en" and langs[1] == "de" and langs[2] == "es"
    assert langs[3] == "unknown"

    q = {r["doc_id"]: r for r in quality_scores(df).collect()}
    assert 0.0 <= q[0]["quality_score"] <= 1.0
    assert q[0]["alpha_ratio"] > q[3]["alpha_ratio"]

    t = {r["doc_id"]: r for r in token_counts(df).collect()}
    assert t[0]["n_ws_tokens"] == len(rows[0][1].split())
    assert t[0]["n_bpe_pieces"] >= t[0]["n_ws_tokens"]


def test_fingerprint_invariance(spark):
    from kgx.extras.textstats import fingerprint

    rows = [
        (0, "alpha beta   gamma"),
        (1, "ALPHA beta gamma"),  # case -> same fp_sha after lower+normalize
        (2, "gamma beta alpha"),  # reorder -> same fp_sim, different fp_sha
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in fingerprint(df).collect()}
    assert got[0]["fp_sha"] == got[1]["fp_sha"]
    assert got[0]["fp_sim"] == got[2]["fp_sim"]
    assert got[0]["fp_sha"] != got[2]["fp_sha"]


# --- multimodal --------------------------------------------------------------


def test_multimodal_features_deterministic(spark):
    from kgx.extras.multimodal import extract_features, synthesize_media

    media = synthesize_media(spark, 30)
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 30
    assert all(r["ok"] for r in rows.values())
    assert all(len(r["feature"]) == 16 for r in rows.values())
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[i] == rows[i]["feature"] for i in rows)


def test_multimodal_expected_matches_spark_kernel(spark):
    """Drift gate (round-3 advice): the fixture generator's precomputed
    multimodal oracle must equal the real mapInPandas kernel's aggregate —
    a kernel change now fails here at test time, not at bench time."""
    import pandas as pd

    from kgx.extras.multimodal import extract_features, synthesize_media
    from kgx.fixtures.gen import expected_multimodal_features

    got = (
        extract_features(synthesize_media(spark, 64))
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.sum(F.element_at("feature", 1)), 4).alias("f0_sum"),
        )
        .orderBy("kind")
        .toPandas()
    )
    exp = expected_multimodal_features(64)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )


# --- hybrid bucket edges (mega-bucket star) ---------------------------------


def test_simhash_max_hamming_guard(spark):
    from kgx.extras.dedup import simhash_dedup

    df = spark.createDataFrame([(0, "a"), (1, "b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="complete-candidate"):
        simhash_dedup(df, "text", "doc_id", max_hamming=4)


def test_bucket_edges_k_roots(spark):
    """Mega-buckets fan star edges to the K smallest ids; small buckets
    stay complete all-pairs."""
    from kgx.extras.dedup import _bucket_edges

    mega = spark.createDataFrame([(0, i) for i in range(12)], "b int, id long")
    e1 = {(r.src, r.dst) for r in _bucket_edges(mega, ["b"], "id", star_roots=1).collect()}
    e2 = {(r.src, r.dst) for r in _bucket_edges(mega, ["b"], "id", star_roots=2).collect()}
    assert e1 == {(i, 0) for i in range(1, 12)}
    assert e2 == e1 | {(i, 1) for i in range(2, 12)}

    small = spark.createDataFrame([(0, i) for i in range(5)], "b int, id long")
    es = {(r.src, r.dst) for r in _bucket_edges(small, ["b"], "id").collect()}
    assert es == {(a, c) for a in range(5) for c in range(5) if a < c}


def test_mega_bucket_second_root_recall(spark):
    """Adversarial mega-bucket (round-3 verdict item, measured): a near-dup
    family NOT containing the bucket minimum is missed by the single-root
    star but recovered by the second root.  A family containing neither of
    the K roots would still be missed — the documented residual."""
    from kgx.canon.cc import connected_components
    from kgx.extras.dedup import _bucket_edges, jaccard_pairs_udf

    base_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    base_b = "one two three four five six seven eight nine ten eleven " * 6
    texts = {0: base_a, 5: base_a + "tail", 1: base_b, 7: base_b + "tail"}
    for i in range(12):
        texts.setdefault(i, " ".join(f"w{i}x{j}" for j in range(40)))

    ids = spark.createDataFrame([(0, i) for i in range(12)], "b int, id long")
    txt = spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], "tid long, text string"
    )

    def components(star_roots: int) -> dict:
        cand = _bucket_edges(ids, ["b"], "id", star_roots=star_roots)
        ta = txt.select(F.col("tid").alias("src"), F.col("text").alias("ta"))
        tb = txt.select(F.col("tid").alias("dst"), F.col("text").alias("tb"))
        verified = (
            cand.join(ta, "src")
            .join(tb, "dst")
            .withColumn("j", jaccard_pairs_udf("ta", "tb"))
            .filter(F.col("j") >= 0.8)
            .select("src", "dst")
        )
        return {r.node_id: r.component_id for r in connected_components(verified).collect()}

    c1 = components(1)
    assert c1.get(0) == c1.get(5) is not None  # family holding root0: found
    assert c1.get(7) is None  # family holding only root1: MISSED at K=1

    c2 = components(2)
    assert c2[0] == c2[5]
    assert c2[1] == c2[7]  # recovered through the second root
    assert c2[0] != c2[1]  # distinct families stay distinct


def test_embedding_dedup_clusters(spark):
    """Cosine near-dup family: exact copies collapse in the pre-pass,
    positively-scaled copies ride LSH+verify (sign-invariant buckets,
    cosine 1), negated vectors (cosine -1) must NOT cluster."""
    import numpy as np

    from kgx.extras.dedup import embedding_dedup

    rng = np.random.default_rng(7)
    base = {i: rng.normal(size=16).astype("float32") for i in range(6)}
    rows = [(i, [float(x) for x in v]) for i, v in base.items()]
    rows += [
        (10, [float(x) for x in base[0]]),          # exact copy of 0
        (11, [float(x) * 1.5 for x in base[1]]),    # scaled copy of 1 (cos=1)
        (12, [float(-x) for x in base[2]]),         # negation of 2 (cos=-1)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.cluster_id
        for r in embedding_dedup(df, "embedding", "vec_id", dim=16).collect()
    }
    assert got[10] == got[0]
    assert got[11] == got[1]
    assert got[12] != got[2]
    assert got[0] != got[1] != got[2]
    # singletons keep their own id
    assert got[3] == 3 and got[4] == 4 and got[5] == 5


def test_embedding_dedup_null_placement_not_merged(spark):
    """The exact pre-pass digest must encode nulls explicitly: concat_ws
    drops null array elements, so [1,null,2] / [null,1,2] / [1,2] would
    otherwise collide into one digest and be wrongly merged (round-4
    advice)."""
    from kgx.extras.dedup import embedding_dedup

    rows = [
        (0, [1.0, None, 2.0]),
        (1, [None, 1.0, 2.0]),
        (2, [1.0, 2.0, None]),
        (3, [1.0, None, 2.0]),  # true byte-identical copy of 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.cluster_id
        for r in embedding_dedup(df, "embedding", "vec_id", dim=3).collect()
    }
    assert got[3] == got[0]  # identical vectors still collapse
    assert len({got[0], got[1], got[2]}) == 3  # null placement kept distinct


def test_multimodal_resize_and_frames(spark):
    """resize (1->1 payload transform) and frame-sample (1->N explode)
    plumbing: correct schemas, pass-through/omission of non-matching kinds,
    deterministic fake kernels."""
    from kgx.extras.multimodal import resize_images, sample_frames, synthesize_media

    media = synthesize_media(spark, 30)

    rs = resize_images(media, width=8, height=4).collect()
    assert len(rs) == 30
    imgs = [r for r in rs if r.kind == "image"]
    assert imgs and all(r.ok and len(bytes(r.payload)) == 32 for r in imgs)
    assert all(not r.ok and r.payload is None for r in rs if r.kind != "image")
    again = resize_images(media, width=8, height=4).collect()
    assert sorted((r.media_id, bytes(r.payload or b"")) for r in again) == sorted(
        (r.media_id, bytes(r.payload or b"")) for r in rs
    )

    fr = sample_frames(media, every_ms=1000, max_frames=4).collect()
    vids = {r.media_id for r in media.filter("kind = 'video'").collect()}
    assert {r.media_id for r in fr} == vids
    by: dict = {}
    for r in fr:
        by.setdefault(r.media_id, []).append(r)
    for mid, rows in by.items():
        # duration_ms = 1000*(1+media_id) -> min(1+media_id, 4) frames
        assert len(rows) == min(1 + mid, 4)
        assert sorted(r.frame_idx for r in rows) == list(range(len(rows)))
        assert all(len(bytes(r.frame)) == 32 for r in rows)
        assert all(r.ts_ms == r.frame_idx * 1000 for r in rows)
