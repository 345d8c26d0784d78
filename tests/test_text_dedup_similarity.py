"""Training-data ops over the driver's documents/embeddings tables."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import dedup, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count_matches_python(docs):
    rows = docs.select("text", text.token_count("text").alias("tc")).collect()
    for r in rows[:200]:
        expected = len(r.text.split()) if r.text and r.text.strip() else 0
        assert r.tc == expected, r.text


def test_lang_id_buckets(docs):
    got = docs.select(text.lang_id("text").alias("lang")).groupBy("lang").count().collect()
    langs = {r.lang for r in got}
    assert langs <= {"en", "de", "fr", "es", "und"}
    assert len(langs) >= 2  # heuristics must discriminate on the corpus


def test_quality_score_range(docs):
    mm = docs.select(
        F.min(text.quality_score("text")).alias("lo"),
        F.max(text.quality_score("text")).alias("hi"),
    ).first()
    assert 0.0 <= mm.lo <= mm.hi <= 1.0


def test_fingerprint_dedup_consistency(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")], ["doc_id", "text"]
    )
    fps = df.select("doc_id", text.fingerprint("text").alias("fp")).collect()
    by_id = {r.doc_id: r.fp for r in fps}
    assert by_id[1] == by_id[2] != by_id[3]
    kept = dedup.dedup_exact(df).collect()
    assert {(r.doc_id, r.dup_count) for r in kept} == {(1, 2), (3, 1)}


def test_ngram_jaccard_oracle(spark):
    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely unrelated sentence about spark engines"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, threshold=0.5, n=3, max_shingle_freq=None).collect()
    }
    # python oracle
    def sh(t, n=3):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)} or {t}

    for (a, ta), (b, tb) in [(texts[0], texts[1]), (texts[0], texts[3]), (texts[0], texts[2])]:
        j = len(sh(ta) & sh(tb)) / len(sh(ta) | sh(tb))
        if j >= 0.5:
            assert abs(pairs[(a, b)] - j) < 1e-6
        else:
            assert (a, b) not in pairs
    assert pairs[(1, 4)] == 1.0


def test_minhash_lsh_finds_near_dups(docs, spark):
    """LSH must recover the high-Jaccard pairs that exact ngram finds."""
    sample = docs.limit(150)
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(sample, threshold=0.8, max_shingle_freq=None).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(sample, threshold=0.6, num_hashes=64, bands=16).collect()
    }
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, (recall, len(exact), len(approx))


def test_simhash_identical_texts(spark):
    df = spark.createDataFrame(
        [(1, "spark engines process data fast"), (2, "spark engines process data fast"),
         (3, "unrelated words entirely here now")],
        ["doc_id", "text"],
    )
    pairs = dedup.simhash_pairs(df, max_hamming=3).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].hamming == 0


def test_simhash_permuted_complete_vs_exact(spark):
    """Manku permuted-table blocking must be COMPLETE for
    hamming ≤ blocks − t: on a random corpus, its output equals the exact
    all-pairs hamming ≤ k set computed straight from the sketches, for two
    (blocks, k) shapes."""
    import random

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, 12)
        rows.append((i, " ".join(base)))
        if i % 4 == 0:  # planted near-dup: one-token edit
            mut = list(base)
            mut[rng.randrange(len(mut))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(mut)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sk = {r.id: r.simhash for r in dedup.simhash_sketch(
        df, "doc_id", "text", ngram=3).collect()}
    ids = sorted(sk)
    for blocks, k in [(6, 4), (4, 2)]:
        exact = {
            (a, b)
            for ai, a in enumerate(ids) for b in ids[ai + 1:]
            if bin(sk[a] ^ sk[b]).count("1") <= k
        }
        got = {
            (r.id_a, r.id_b)
            for r in dedup.simhash_pairs_permuted(
                df, "doc_id", "text", max_hamming=k, blocks=blocks, ngram=3
            ).collect()
        }
        assert got == exact, f"blocks={blocks} k={k}"
    assert exact  # non-trivial: the planted near-dups must land within k
    with pytest.raises(ValueError, match="blocks > max_hamming"):
        dedup.simhash_pairs_permuted(df, max_hamming=6, blocks=6)


def test_brute_force_topk_vs_numpy(embs):
    qs = embs.limit(5)
    got = similarity.brute_force_topk(qs, embs, k=5).collect()
    ep = embs.toPandas()
    mat = np.stack([np.asarray(v, dtype="float32") for v in ep.embedding])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = ep.vec_id.to_numpy()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        qv = mat[ids == qid][0]
        sims = mat @ qv
        order = [int(ids[i]) for i in np.argsort(-sims) if ids[i] != qid][:5]
        got_ids = [r.match_id for r in sorted(rows, key=lambda r: r.rank)]
        # allow tie-order differences: compare score sets
        exp_scores = sorted(np.sort(sims)[::-1][1:6].round(4), reverse=True)
        got_scores = sorted((r.score for r in rows), reverse=True)
        np.testing.assert_allclose(got_scores, exp_scores, atol=1e-3)
        assert got_ids[0] == order[0]


def test_lsh_topk_recall_planted(spark, embs):
    """LSH recall on its actual use case: high-cosine neighbors. The driver
    embeddings are near-uniform random (top-1 cos ≈ 0.35 — no locality for
    ANY sublinear index), so plant perturbed copies as queries and require
    the planted source as top-1."""
    ep = embs.limit(200).toPandas()
    rng = np.random.default_rng(1)
    qrows = []
    for i in range(10):
        v = np.asarray(ep.embedding.iloc[i], dtype="float32")
        qrows.append((10_000 + int(ep.vec_id.iloc[i]), (v + rng.normal(0, 0.01, len(v)).astype("float32")).tolist()))
    qs = spark.createDataFrame(qrows, "vec_id long, embedding array<float>")
    approx = similarity.lsh_topk(qs, embs, k=3, planes=10, probes=8, dim=64).collect()
    top1 = {r.query_id: r.match_id for r in approx if r.rank == 1}
    hits = sum(1 for qid, mid in top1.items() if mid == qid - 10_000)
    assert hits >= 8, top1


def test_lsh_topk_subset_of_valid_scores(embs):
    """On unstructured data LSH results must still be valid cosine rows
    bounded by the exact top-1."""
    qs = embs.limit(5)
    exact = similarity.brute_force_topk(qs, embs, k=1).collect()
    approx = similarity.lsh_topk(qs, embs, k=3, planes=8, probes=4, dim=64).collect()
    best = {r.query_id: r.score for r in exact}
    for r in approx:
        assert r.score <= best[r.query_id] + 1e-6


def test_lsh_topk_arrow_equals_expr(embs):
    """The Arrow matmul bucket kernel (production default) and the
    oracle-reproducible expr path must return identical top-k rows."""
    qs = embs.limit(5)
    def rows(impl):
        return sorted(
            (r.query_id, r.rank, r.match_id, r.score)
            for r in similarity.lsh_topk(
                qs, embs, k=3, planes=8, probes=4, dim=64, impl=impl).collect()
        )
    assert rows("arrow") == rows("expr")


def test_ivf_topk_arrow_equals_expr(embs):
    """IVF cell assignment: the Arrow matmul kernel (production) and the
    oracle-reproducible expr path must return identical top-k rows."""
    dembs = embs.withColumn("embedding", F.col("embedding").cast("array<double>"))
    qs = dembs.limit(5)

    def rows(impl):
        return sorted(
            (r.query_id, r.rank, r.match_id, r.score)
            for r in similarity.ivf_topk(
                qs, dembs, k=3, nlist=8, nprobe=3, impl=impl).collect()
        )

    assert rows("arrow") == rows("expr")


def test_ivf_topk_full_probe_equals_brute_force(embs):
    """nprobe == nlist searches every cell, so the IVF output must EQUAL
    exact brute force — gates the cell partition (no vector lost/dup)."""
    qs = embs.limit(5)
    exact = sorted(
        (r.query_id, r.rank, r.match_id, round(r.score, 4))
        for r in similarity.brute_force_topk(qs, embs, k=3).collect()
    )
    ivf = sorted(
        (r.query_id, r.rank, r.match_id, round(r.score, 4))
        for r in similarity.ivf_topk(
            qs, embs, k=3, nlist=8, nprobe=8, impl="arrow").collect()
    )
    assert ivf == exact


def test_ivf_topk_subset_of_valid_scores(embs):
    """Partial probing returns a SUBSET of correctly-scored pairs: every
    (query, match) the IVF path emits must carry EXACTLY the score brute
    force gives that pair (catches a vector-column mixup in the rerank
    join, not just an inflated best)."""
    qs = embs.limit(5)
    n_index = embs.count()
    exact = {(r.query_id, r.match_id): r.score
             for r in similarity.brute_force_topk(qs, embs, k=n_index).collect()}
    approx = similarity.ivf_topk(qs, embs, k=3, nlist=16, nprobe=2).collect()
    assert approx  # probing 2 of 16 cells still surfaces neighbors
    for r in approx:
        assert exact[(r.query_id, r.match_id)] == r.score


def test_ivf_materialized_index_roundtrip(spark, embs, tmp_path):
    """Train-once/assign-once: ivf_assign written partitionBy('cell') to
    parquet and read back must give ivf_topk(assigned=...) the same rows
    as the inline path — the 100 TB build-once index story."""
    import os

    cents = similarity.ivf_train(embs, nlist=8)
    assigned = similarity.ivf_assign(embs, cents)
    path = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cell").parquet(path)
    assert any(d.startswith("cell=") for d in os.listdir(path))
    back = spark.read.parquet(path)

    qs = embs.limit(5)
    inline = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.ivf_topk(qs, embs, k=3, nlist=8, nprobe=3).collect())
    reused = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.ivf_topk(
            qs, embs, k=3, nprobe=3, centroids=cents, assigned=back).collect())
    assert inline == reused


def test_ivf_topk_null_vectors_drop_on_both_impls(spark):
    """NULL embeddings must vanish identically on the expr and arrow paths
    (expr's cosine null→0.0 convention once filed them under the lowest
    cid while the arrow kernel dropped them — code-review finding)."""
    rows = [(i, [float(i + 1), float((i * 7) % 5)]) for i in range(20)]
    df = spark.createDataFrame(
        rows + [(99, None)], "vec_id bigint, embedding array<double>")
    qs = df.filter((F.col("vec_id") < 3) | F.col("embedding").isNull())

    def got(impl):
        return sorted(
            (r.query_id, r.rank, r.match_id, r.score)
            for r in similarity.ivf_topk(
                qs, df, k=2, nlist=4, nprobe=2, impl=impl).collect()
        )

    a, e = got("arrow"), got("expr")
    assert a == e
    ids = {t[0] for t in a} | {t[2] for t in a}
    assert 99 not in ids  # the null vector neither queries nor matches


def test_bm25_matches_pure_python(spark):
    """bm25_topk vs an independent from-the-formula Python BM25 on a tiny
    corpus: same pairs, same scores to 1e-6."""
    import math

    from towhee_spark.functions.ranking import bm25_topk

    texts = {
        1: "spark shuffles data across the cluster",
        2: "cats nap in warm sunny spots all day",
        3: "spark joins and spark aggregations shuffle data",
        4: "",
        5: "the cluster runs spark jobs all day",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    qs = spark.createDataFrame(
        [(100, "spark data cluster"), (200, "cats day")],
        "query_id long, question string")
    got = {(r.query_id, r.match_id): (r.score, r.rank)
           for r in bm25_topk(qs, docs, k=10).collect()}

    toks = {i: t.lower().split() for i, t in texts.items()}
    n = len(texts)
    avgdl = sum(len(v) for v in toks.values()) / n
    k1, b = 1.2, 0.75

    def score(q, d):
        s = 0.0
        for t in set(q.lower().split()):
            tf = toks[d].count(t)
            if not tf:
                continue
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks[d]) / avgdl))
        return s

    expect = {}
    for qid, qtext in ((100, "spark data cluster"), (200, "cats day")):
        scs = sorted(
            ((round(score(qtext, d), 6), d) for d in texts
             if score(qtext, d) > 0 or any(
                 t in toks[d] for t in qtext.split())),
            key=lambda x: (-x[0], x[1]))
        for rank, (sc, d) in enumerate(scs, 1):
            expect[(qid, d)] = (sc, rank)
    assert got == expect
    # self-retrieval ranks self first
    self_q = docs.filter(F.col("doc_id") == 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("question"))
    top = bm25_topk(self_q, docs, k=1).collect()[0]
    assert top.match_id == 3


def test_rrf_fuse_matches_pure_python(spark):
    """rrf_fuse vs the formula: score(q,d) = Σ_r 1/(c+rank_r), pairs seen
    by only one ranker get one term, ties break on match_id, top-k cut."""
    from towhee_spark.functions.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1.0, 1), (1, 11, 0.9, 2), (1, 12, 0.8, 3)],
        "query_id long, match_id long, score double, rank int")
    b = spark.createDataFrame(
        [(1, 11, 0.7, 1), (1, 13, 0.6, 2), (1, 10, 0.5, 3)],
        "query_id long, match_id long, score double, rank int")
    got = [(r.match_id, r.score, r.rank)
           for r in rrf_fuse([a, b], k=3, c=60).orderBy("rank").collect()]
    exp = sorted(
        ((d, round(s, 6)) for d, s in {
            10: 1 / 61 + 1 / 63,
            11: 1 / 62 + 1 / 61,
            12: 1 / 63,
            13: 1 / 62,
        }.items()),
        key=lambda t: (-t[1], t[0]))[:3]
    assert got == [(d, s, i + 1) for i, (d, s) in enumerate(exp)]
    # 11 appears rank-2 + rank-1 and must beat 10's rank-1 + rank-3
    assert got[0][0] == 11

    import pytest

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])

    # cached-dep propagation: deps tagged on the input rankings surface on
    # the fused output, so one release_cached() frees every ranker's cache
    from towhee_spark.functions.dedup import _with_cached_deps

    fused = rrf_fuse([_with_cached_deps(a, a), _with_cached_deps(b, b)], k=3)
    assert fused._cached_deps == [a, b]  # noqa: SLF001


def test_chunk_text_no_subset_chunks(spark):
    """Review fix: no trailing chunk fully contained in its predecessor,
    and empty/whitespace docs yield ZERO chunks."""
    from towhee_spark.functions import text as _text

    rows = [(0, " ".join(f"w{i}" for i in range(64))),   # exactly one window
            (1, " ".join(f"w{i}" for i in range(100))),  # truncated final
            (2, ""), (3, None), (4, "   "), (5, "short doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = df.select("doc_id", _text.chunk_text("text", size=64, overlap=16).alias("c"))
    got = {r.doc_id: [(s.start, len(s.chunk.split())) for s in r.c]
           for r in out.collect()}
    assert got[0] == [(0, 64)]          # start 48 would be a subset chunk
    assert got[1] == [(0, 64), (48, 52)]  # final chunk adds tokens 65..100
    assert got[2] == got[3] == got[4] == []  # empty docs: zero chunks
    assert got[5] == [(0, 2)]


def test_simhash_weighted_sketch(spark):
    """weight='count' = Charikar term-frequency voting, checked against a
    pure-Python reference; unigram weighted == unigram bag (same votes,
    pre-aggregated); n-gram weighted DIFFERS from set semantics when a
    shingle repeats."""
    import zlib

    from pyspark.sql.functions import xxhash64  # noqa: F401  (hash parity via Spark)

    rows = [(0, "spam spam spam spam unique words here"),
            (1, "alpha beta gamma alpha beta gamma alpha beta gamma delta x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uni_bag = {r.id: r.simhash for r in dedup.simhash_sketch(df, "doc_id", "text").collect()}
    uni_w = {r.id: r.simhash
             for r in dedup.simhash_sketch(df, "doc_id", "text", weight="count").collect()}
    assert uni_bag == uni_w  # per-occurrence voting == tf-weighted voting

    tri_set = {r.id: r.simhash
               for r in dedup.simhash_sketch(df, "doc_id", "text", ngram=2).collect()}
    tri_w = {r.id: r.simhash
             for r in dedup.simhash_sketch(df, "doc_id", "text", ngram=2,
                                           weight="count").collect()}
    # doc 1 repeats the ('alpha beta' etc.) shingles 3x — weighting must bias
    # its sketch toward those shingles' bits, diverging from set semantics
    assert tri_w[1] != tri_set[1]

    # cross-check doc 1's weighted sketch against a Python reference using
    # Spark's own xxhash64 for hash parity
    sh = dedup.shingles(df.filter("doc_id = 1"), "doc_id", "text", 2,
                        distinct=False)
    hw = (sh.groupBy("shingle").count()
          .withColumn("h", xxhash64("shingle")).collect())
    votes = [0] * 63
    for r in hw:
        for b in range(63):
            votes[b] += r["count"] if (r.h >> b) & 1 else -r["count"]
    expected = sum(1 << b for b in range(63) if votes[b] > 0)
    assert tri_w[1] == expected


def test_embedding_neardup_pairs(spark):
    base = np.random.default_rng(0).normal(size=(20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
    #近-duplicates: ids 100+i are tiny perturbations of i<3
    for i in range(3):
        rows.append((100 + i, [float(x) for x in base[i] + 1e-3]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in dedup.embedding_neardup_pairs(df, threshold=0.99, dim=16).collect()}
    assert {(0, 100), (1, 101), (2, 102)} <= pairs


def test_embedding_neardup_recall_at_boundary(spark):
    """Recall gate on pairs planted AT the decision boundary — cosine drawn
    uniformly from [0.9505, 0.99] (not 1e-3 perturbations, whose cos ≈ 1.0
    never exercised the blocking): the production config (16 tables × 16
    planes, OR-amplified) must recover ≥ 0.95 of planted near-dups among
    2000 random background vectors. The single-table design this replaces
    measured ~0.28 recall on this exact corpus."""
    dim, n_bg, n_pairs = 64, 2000, 200
    rng = np.random.default_rng(42)
    rows = []
    bg = rng.normal(size=(n_bg, dim))
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    for i, v in enumerate(bg):
        rows.append((i, [float(x) for x in v]))
    planted = []
    for j in range(n_pairs):
        v1 = rng.normal(size=dim)
        v1 /= np.linalg.norm(v1)
        u = rng.normal(size=dim)
        u -= (u @ v1) * v1
        u /= np.linalg.norm(u)
        c = rng.uniform(0.9505, 0.99)
        v2 = c * v1 + np.sqrt(1 - c * c) * u
        a, b = 10_000 + 2 * j, 10_001 + 2 * j
        rows.append((a, [float(x) for x in v1]))
        rows.append((b, [float(x) for x in v2]))
        planted.append((a, b))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b)
           for r in dedup.embedding_neardup_pairs(df, threshold=0.95, dim=dim).collect()}
    recall = sum(1 for p in planted if p in got) / n_pairs
    assert recall >= 0.95, f"boundary recall {recall:.3f} < 0.95"
    # the Arrow matmul signature kernel (production default) and the
    # oracle-reproducible expr path must produce the same pair set — ALSO
    # in the presence of a NULL embedding (review fix: the kernel used to
    # crash the batch; both paths must just drop the null row)
    sub = df.filter(F.col("vec_id") < 10_100).unionByName(
        spark.createDataFrame([(999_999, None)],
                              "vec_id long, embedding array<double>"))
    arrow = {(r.id_a, r.id_b, r.cosine) for r in dedup.embedding_neardup_pairs(
        sub, threshold=0.95, dim=dim, impl="arrow").collect()}
    expr = {(r.id_a, r.id_b, r.cosine) for r in dedup.embedding_neardup_pairs(
        sub, threshold=0.95, dim=dim, impl="expr").collect()}
    assert arrow == expr
    assert not any(999_999 in (a, b) for a, b, _ in arrow)
    # precision stays exact by construction (candidate-bounded cosine verify)
    for a, b in got:
        assert not (10_000 <= a < 10_000 + 2 * n_pairs) or (a, b) in planted or b >= 10_000


def test_sketch_profile_accuracy(spark):
    """HLL distinct estimate within rsd bounds; approx quantiles within the
    GK epsilon of exact (events table)."""
    from towhee_spark.functions.sketches import sketch_profile

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {r.event_type: r for r in
           sketch_profile(ev, ["event_type"], "user_id", "value").collect()}
    exact = {r.event_type: r for r in
             ev.groupBy("event_type").agg(
                 F.countDistinct("user_id").alias("d"),
                 F.expr("percentile(value, 0.5)").alias("p50"),
             ).collect()}
    for et, e in exact.items():
        g = got[et]
        assert abs(g[f"approx_n_user_id"] - e.d) <= max(2, 0.1 * e.d), (et, g, e)
        assert abs(g["p50_value"] - e.p50) <= 0.1 * max(1.0, abs(e.p50)), (et, g, e)


def test_two_phase_topk_equals_single_window(spark, embs):
    """Shard-local pre-prune must be invisible: (score desc, match_id asc)
    is a total order, so two-phase == one-window results exactly."""
    qs = embs.filter(F.col("vec_id") < 8)
    two = similarity.brute_force_topk(qs, embs, k=4, shards=16).collect()
    one = similarity.brute_force_topk(qs, embs, k=4, shards=None).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(((r.query_id, r.rank, r.match_id, r.score) for r in two)) == \
           sorted(((r.query_id, r.rank, r.match_id, r.score) for r in one))


def test_scan_topk_matches_brute_force(spark, embs):
    """Arrow scan path (per-partition heaps, zero scored-pair shuffle) must
    return the exact top-k: same ids and scores as the window plan."""
    qs = embs.filter(F.col("vec_id") < 8)
    scan = similarity.scan_topk(qs, embs, k=4)
    brute = similarity.brute_force_topk(qs, embs, k=4)
    s = {(r.query_id, r.rank): (r.match_id, round(r.score, 5)) for r in scan.collect()}
    b = {(r.query_id, r.rank): (r.match_id, round(r.score, 5)) for r in brute.collect()}
    assert s == b


def test_plan_construction_is_action_free(spark, embs, monkeypatch):
    """Building lsh_topk / embedding_neardup / brute_force plans must not
    trigger Spark jobs (ADVICE: hidden .first() at plan build). Monkeypatch
    every driver-side action to raise; construction must still succeed."""
    from pyspark.sql import DataFrame

    def boom(*a, **k):
        raise AssertionError("driver action during plan construction")

    for action in ("collect", "first", "head", "take", "toPandas", "count"):
        monkeypatch.setattr(DataFrame, action, boom)
    qs = embs.limit(5)
    similarity.lsh_topk(qs, embs, k=3, planes=8, probes=4, dim=64)
    similarity.brute_force_topk(qs, embs, k=3)
    dedup.embedding_neardup_pairs(embs, threshold=0.95, dim=64)
    dedup.minhash_lsh_pairs(spark.read.parquet(f"{SF}/documents.parquet"),
                            threshold=0.5, verify="exact")


# -- semdedup ---------------------------------------------------------------


def test_semdedup_arrow_equals_expr(embs):
    """The Arrow assignment kernel (production) and the oracle expr path
    must produce the identical (vec_id, cell, dup_of) mapping."""
    dembs = embs.withColumn("embedding", F.col("embedding").cast("array<double>"))

    def rows(impl):
        out = dedup.semdedup(dembs, nlist=8, threshold=0.3, impl=impl)
        got = sorted((r.vec_id, r.cell, r.dup_of) for r in out.collect())
        dedup.release_cached(out)
        return got

    assert rows("arrow") == rows("expr")


def test_semdedup_planted_duplicates(spark, embs):
    """Planted near-copies (cos >= 0.99 of a base vector) must map to the
    SAME cell and be pruned down to exactly one representative — the
    min-id base vector — while unrelated vectors survive untouched."""
    rng = np.random.default_rng(7)
    base = [r for r in embs.limit(6).collect() if r.embedding]
    rows = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in base]
    planted = []
    for r_id, vec in rows[:3]:  # 2 jittered copies of each of 3 bases
        v = np.array(vec)
        for j in (1, 2):
            w = v + rng.normal(0, 0.01 * np.abs(v).mean(), v.shape)
            planted.append((100_000 + r_id * 10 + j, [float(x) for x in w]))
    df = spark.createDataFrame(rows + planted, "vec_id long, embedding array<double>")
    out = dedup.semdedup(df, nlist=2, threshold=0.98, impl="arrow")
    got = {r.vec_id: (r.cell, r.dup_of) for r in out.collect()}
    dedup.release_cached(out)
    for r_id, _ in rows[:3]:
        cell, dup_of = got[r_id]
        assert dup_of is None  # the base is the min-id representative
        for j in (1, 2):
            c_cell, c_dup = got[100_000 + r_id * 10 + j]
            assert c_cell == cell  # near-copy lands in the same cell
            assert c_dup == r_id  # pruned back to the planted base
    for r_id, _ in rows[3:]:  # unplanted vectors survive
        assert got[r_id][1] is None


def test_semdedup_null_vectors_pass_through(spark):
    """NULL embeddings keep their row with cell/dup_of NULL (never joined,
    never dropped) — the ivf_assign null posture."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, None)],
        "vec_id long, embedding array<double>")
    out = dedup.semdedup(df, nlist=1, threshold=0.9, impl="expr")
    got = {r.vec_id: (r.cell, r.dup_of) for r in out.collect()}
    dedup.release_cached(out)
    assert got[3] == (None, None)
    assert got[1] == (1, None)  # vec 1 is the only centroid & survivor
    assert got[2] == (1, 1)


# -- product quantization ---------------------------------------------------


def test_pq_adc_arrow_equals_expr(embs):
    """The Arrow encode kernel (production) and the oracle expr path must
    return identical top-k rows."""
    dembs = embs.withColumn("embedding", F.col("embedding").cast("array<double>"))
    qs = dembs.limit(5)

    def rows(impl):
        return sorted(
            (r.query_id, r.rank, r.match_id, r.score)
            for r in similarity.pq_adc_topk(
                qs, dembs, k=3, m=4, ksub=8, impl=impl).collect())

    assert rows("arrow") == rows("expr")


def test_pq_encode_codebook_rows_are_fixed_points(embs):
    """Encoding a codebook row must pick its OWN code in every subspace
    (L2 distance 0 is the unique argmin) — gates the encode argmax and
    the 1-based code numbering in one shot."""
    cbs = similarity.pq_train(embs, ksub=8)
    code_ids = {cid for cid, _ in similarity.ivf_train(embs, nlist=8)}
    rows = similarity.pq_encode(
        embs.filter(F.col("vec_id").isin(list(code_ids))), cbs, m=4).collect()
    by_vec = {tuple(round(float(x), 5) for x in v) : code for code, v in cbs}
    for r in rows:
        want = by_vec[tuple(round(float(x), 5) for x in r.embedding)]
        assert r.codes == [want] * 4, (r.vec_id, r.codes, want)


def test_pq_materialized_code_index_roundtrip(spark, embs, tmp_path):
    """pq_encode written to parquet (codes only — the compressed index)
    and read back must give pq_adc_topk(encoded=...) the same rows as the
    inline path — the 16-bytes-per-vector 100 TB scan story."""
    cbs = similarity.pq_train(embs, ksub=8)
    path = str(tmp_path / "pq_codes")
    similarity.pq_encode(embs, cbs, m=4).select("vec_id", "codes").write.parquet(path)
    back = spark.read.parquet(path)
    qs = embs.limit(5)
    inline = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.pq_adc_topk(qs, embs, k=3, m=4, ksub=8).collect())
    reused = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.pq_adc_topk(
            qs, embs, k=3, m=4, codebooks=cbs, encoded=back).collect())
    assert inline == reused


def test_pq_rejects_bad_geometry(embs):
    """dim % m != 0 and non-contiguous codebook codes fail loudly at plan
    time, not as silent wrong answers."""
    with pytest.raises(ValueError, match="not divisible"):
        similarity.pq_adc_topk(embs.limit(2), embs, m=5, ksub=8)
    cbs = similarity.pq_train(embs, ksub=8)
    with pytest.raises(ValueError, match="contiguous"):
        similarity.pq_encode(embs, [(c + 1, v) for c, v in cbs], m=4)


def test_ivfpq_arrow_equals_expr(embs):
    """Both kernels (cell assignment + PQ encode) vs the expr path must
    return identical top-k rows for the composite."""
    dembs = embs.withColumn("embedding", F.col("embedding").cast("array<double>"))
    qs = dembs.limit(5)

    def rows(impl):
        return sorted(
            (r.query_id, r.rank, r.match_id, r.score)
            for r in similarity.ivfpq_topk(
                qs, dembs, k=3, nlist=8, nprobe=3, m=4, ksub=8,
                impl=impl).collect())

    assert rows("arrow") == rows("expr")


def test_ivfpq_full_probe_equals_pq(embs):
    """nprobe == nlist scans every cell, so IVF-PQ must EQUAL the plain
    PQ ADC scan — gates that the cell pruning loses nothing beyond the
    cells it prunes."""
    qs = embs.limit(5)
    pq = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.pq_adc_topk(qs, embs, k=3, m=4, ksub=8).collect())
    ivfpq = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.ivfpq_topk(
            qs, embs, k=3, nlist=8, nprobe=8, m=4, ksub=8).collect())
    assert ivfpq == pq


def test_ivfpq_materialized_index_roundtrip(spark, embs, tmp_path):
    """pq_encode(ivf_assign(...)) written partitionBy('cell') and read
    back must give ivfpq_topk(assigned_encoded=...) the same rows as the
    inline path — the build-once compressed inverted file."""
    cents = similarity.ivf_train(embs, nlist=8)
    cbs = similarity.pq_train(embs, ksub=8)
    path = str(tmp_path / "ivfpq_index")
    similarity.pq_encode(similarity.ivf_assign(embs, cents), cbs, m=4).select(
        "vec_id", "cell", "codes").write.partitionBy("cell").parquet(path)
    back = spark.read.parquet(path)
    qs = embs.limit(5)
    inline = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.ivfpq_topk(
            qs, embs, k=3, nlist=8, nprobe=3, m=4, ksub=8).collect())
    reused = sorted(
        (r.query_id, r.rank, r.match_id, r.score)
        for r in similarity.ivfpq_topk(
            qs, embs, k=3, nprobe=3, m=4, centroids=cents, codebooks=cbs,
            assigned_encoded=back).collect())
    assert inline == reused


def test_scan_topk_query_cap(spark, embs):
    """VERDICT r04 ask: a query set past max_queries= must raise loudly
    (bounded limit(cap+1) collect — never a full materialization), pointing
    at brute_force_topk / the ANN tiers."""
    with pytest.raises(ValueError, match="max_queries.*brute_force_topk"):
        similarity.scan_topk(embs, embs, k=2, max_queries=3)
    # at/under the cap the scan still runs and stays exact
    qs = embs.filter(F.col("vec_id") < 3)
    out = similarity.scan_topk(qs, embs, k=2, max_queries=3)
    assert out.count() == 6


# ---------------------------------------------------------------------------
# hard_negatives (contrastive mining: band-filtered top-k)


def test_hard_negatives_band_semantics(spark, embs):
    """Every emitted row's score lies in [lo, hi); the result equals the
    brute-force scan band-filtered by hand; rank is dense per query."""
    qs = embs.filter(F.col("vec_id") < 8)
    lo, hi = 0.2, 0.9
    out = similarity.hard_negatives(qs, embs, k=5, band=(lo, hi)).collect()
    assert out
    assert all(lo <= r.score < hi for r in out)
    full = similarity.brute_force_topk(qs, embs, k=10**9, shards=None)
    expect = {}
    for r in sorted(full.collect(),
                    key=lambda r: (r.query_id, -r.score, r.match_id)):
        if lo <= r.score < hi and len(expect.setdefault(r.query_id, [])) < 5:
            expect[r.query_id].append(r.match_id)
    got = {}
    for r in sorted(out, key=lambda r: (r.query_id, r.rank)):
        got.setdefault(r.query_id, []).append(r.match_id)
    assert got == expect


def test_hard_negatives_lsh_path_and_validation(spark, embs):
    """method='lsh' emits a subset of the exact in-band set (bucketed
    candidates), never an out-of-band row; bad args fail loudly."""
    qs = embs.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.match_id) for r in similarity.hard_negatives(
        qs, embs, k=10**9, band=(0.2, 0.9), shards=None).collect()}
    lsh = similarity.hard_negatives(
        qs, embs, k=10**9, band=(0.2, 0.9), method="lsh",
        planes=6, probes=4, dim=64, impl="expr").collect()
    assert lsh and {(r.query_id, r.match_id) for r in lsh} <= exact
    assert all(0.2 <= r.score < 0.9 for r in lsh)
    with pytest.raises(ValueError, match="lo < hi"):
        similarity.hard_negatives(qs, embs, band=(0.9, 0.2)).collect()
    with pytest.raises(ValueError, match="unknown method"):
        similarity.hard_negatives(qs, embs, method="ivf")
