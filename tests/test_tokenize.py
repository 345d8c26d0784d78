"""WordPiece tokenizer: expr/arrow lockstep, greedy semantics, edges."""

import pytest
from pyspark.sql import functions as F

from towhee_spark.functions import tokenize as tok

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_wp_py_word_greedy_semantics():
    """The reference walk: longest match wins, position 1 uses bare
    pieces, later positions ## pieces, any dead end → whole word [UNK]."""
    vs = frozenset(["un", "##aff", "##able", "##ab", "aff", "a",
                    "##f", "##l", "##e", "##b"])
    assert tok._wp_py_word("unaffable", vs, 16, 5) == \
        ["un", "##aff", "##able"]
    # longest-match at pos 1: 'aff' beats 'a'
    assert tok._wp_py_word("affable", vs, 16, 5) == ["aff", "##able"]
    # dead end mid-word (no piece matches 'z') → [UNK] for the whole word
    assert tok._wp_py_word("unz", vs, 16, 5) == ["[UNK]"]
    # over-long word → [UNK] without scanning
    assert tok._wp_py_word("unaffable", vs, 4, 5) == ["[UNK]"]


def test_wordpiece_expr_arrow_lockstep(spark, docs):
    """Both impls must produce identical piece streams on the real corpus
    (the VERDICT r04 lockstep requirement) — including [UNK]s from the
    tight max_word_chars."""
    v = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8)
    e = {r.doc_id: (tuple(r.pieces), r.n_tokens)
         for r in tok.wordpiece_tokenize(
             docs, v, impl="expr", max_word_chars=8).collect()}
    a = {r.doc_id: (tuple(r.pieces), r.n_tokens)
         for r in tok.wordpiece_tokenize(
             docs, v, impl="arrow", max_word_chars=8).collect()}
    assert e == a
    assert len(e) == docs.count()  # every doc present, empty or not
    # n_tokens is the piece count
    assert all(len(p) == n for p, n in e.values())


def test_wordpiece_matches_python_reference(spark, docs):
    """The distributed expr plan must equal the plain-Python greedy walk
    applied per document (independent recomputation, not just
    arrow-vs-expr agreement)."""
    v = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8)
    vs = frozenset(v)
    mp = max(len(p[2:] if p.startswith("##") else p)
             for p in v if p != tok.UNK)
    got = {r.doc_id: list(r.pieces)
           for r in tok.wordpiece_tokenize(
               docs, v, impl="expr", max_word_chars=8).collect()}
    pdf = docs.select("doc_id", "text").toPandas()
    for _, row in pdf.iterrows():
        words = tok._normalize_py(row["text"]).split(" ")
        words = [w for w in words if w]
        want = [p for w in words for p in tok._wp_py_word(w, vs, 8, mp)]
        assert got[row["doc_id"]] == want, row["doc_id"]


def test_wordpiece_edges(spark):
    """NULL/empty text → empty pieces; a real BERT-style external vocab
    (not corpus-trained) drops in unchanged."""
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, ""), (3, None), (4, "THE   Quick\tfox")],
        "doc_id int, text string")
    vocab = ["the", "quick", "fox", "t", "##h", "##e", "q", "##u"]
    for impl in ("expr", "arrow"):
        out = {r.doc_id: list(r.pieces)
               for r in tok.wordpiece_tokenize(df, vocab, impl=impl).collect()}
        assert out[1] == ["the", "quick", "fox"]
        assert out[2] == [] and out[3] == []
        # normalization: case-fold + whitespace collapse before the walk
        assert out[4] == ["the", "quick", "fox"]
    with pytest.raises(ValueError, match="empty vocab"):
        tok.wordpiece_tokenize(df, [])
    with pytest.raises(ValueError, match="impl"):
        tok.wordpiece_tokenize(df, vocab, impl="nope")


def test_wordpiece_vocab_deterministic(spark, docs):
    """Vocab training is one action and fully deterministic: same list on
    repeated calls, [UNK] always present, no '##'-ambiguous words."""
    v1 = tok.wordpiece_vocab(docs, n_words=16, n_suffix=4)
    v2 = tok.wordpiece_vocab(docs, n_words=16, n_suffix=4)
    assert v1 == v2
    assert tok.UNK in v1
    # every continuation piece has a non-empty core
    assert all(len(p) > 2 for p in v1 if p.startswith("##"))


def test_token_budget_count_col(spark, docs):
    """curation.sample_to_token_budget(count_col=) budgets in the
    precomputed unit: a stratum whose budget >= its subword total keeps
    every row; a zero budget keeps none."""
    from towhee_spark.functions import curation

    v = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8)
    counts = tok.wordpiece_tokenize(docs, v, impl="arrow").select(
        "doc_id", "n_tokens")
    d = docs.join(counts, "doc_id")
    total = d.agg(F.sum("n_tokens")).collect()[0][0]
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all = curation.sample_to_token_budget(
        d, budgets={s: float(total + 1) for s in langs},
        strata_col="lang", count_col="n_tokens")
    assert keep_all.count() == docs.count()
    keep_none = curation.sample_to_token_budget(
        d, budgets={langs[0]: 0.0}, strata_col="lang",
        count_col="n_tokens")
    assert keep_none.count() == 0


# --- BPE ---------------------------------------------------------------


def _py_bpe_train(word_counts: dict, n_merges: int) -> list:
    """Independent single-node reference: classic BPE over a word-count
    table, most-frequent adjacent pair first, (count desc, pair asc)."""
    syms = {w: ([w] if tok.SEP in w else list(w)) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, c in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        counts = {p: c for p, c in counts.items() if c >= 2}
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges


def test_bpe_train_matches_python_reference(spark, docs):
    """The distributed train loop (pair aggregate + packed-string replace
    per round) must learn the same ordered merge list as the classic
    in-memory BPE trainer."""
    wc = {}
    for row in docs.select("text").toPandas()["text"]:
        for w in tok._normalize_py(row).split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    want = _py_bpe_train(wc, 16)
    got = tok.bpe_train(docs, n_merges=16)
    assert got == want


def test_wordpiece_vocab_distributed_local_lockstep(spark, docs):
    """collect_words=0 forces the two-job distributed rankings; the
    default derives both from the collected word-count table — identical
    vocab (same occurrence-weighted counts, same (c DESC, key ASC)
    orders)."""
    dist = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8,
                               collect_words=0)
    local = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8)
    assert dist == local


def test_bpe_train_distributed_local_lockstep(spark, docs):
    """collect_words=0 forces the distributed per-round loop; the default
    collects the word table and trains driver-side — identical ordered
    merge lists (same pair counts, same (c DESC, pair ASC) argmax, same
    non-overlapping left-to-right packed replace)."""
    dist = tok.bpe_train(docs, n_merges=16, collect_words=0)
    local = tok.bpe_train(docs, n_merges=16)
    assert dist == local


def test_bpe_encode_lockstep_and_roundtrip(spark, docs):
    """expr and arrow encodes agree; concatenated pieces reconstruct the
    normalized words exactly (BPE is lossless — no [UNK])."""
    merges = tok.bpe_train(docs, n_merges=16)
    e = {r.doc_id: tuple(r.pieces)
         for r in tok.bpe_encode(docs, merges, impl="expr").collect()}
    a = {r.doc_id: tuple(r.pieces)
         for r in tok.bpe_encode(docs, merges, impl="arrow").collect()}
    assert e == a
    pdf = docs.select("doc_id", "text").toPandas()
    for _, row in pdf.iterrows():
        words = [w for w in tok._normalize_py(row["text"]).split(" ") if w]
        assert "".join(e[row["doc_id"]]) == "".join(words)


def test_bpe_edges(spark):
    """Empty merges → character stream; SEP-containing words stay whole;
    empty/NULL text → empty pieces; merge order is applied in sequence."""
    df = spark.createDataFrame(
        [(1, "abab ab"), (2, ""), (3, None), (4, "x" + tok.SEP + "y")],
        "doc_id int, text string")
    for impl in ("expr", "arrow"):
        out = {r.doc_id: list(r.pieces)
               for r in tok.bpe_encode(df, [], impl=impl).collect()}
        assert out[1] == ["a", "b", "a", "b", "a", "b"]
        assert out[2] == [] and out[3] == []
        assert out[4] == ["x" + tok.SEP + "y"]
        out2 = {r.doc_id: list(r.pieces)
                for r in tok.bpe_encode(
                    df, [("a", "b"), ("ab", "ab")], impl=impl).collect()}
        assert out2[1] == ["abab", "ab"]
    with pytest.raises(ValueError, match="impl"):
        tok.bpe_encode(df, [], impl="nope")


def test_bpe_merges_parquet_roundtrip(spark, docs, tmp_path):
    """Merge lists persist like the ANN materialized indexes: parquet
    write → reload → identical ordered list → identical encode."""
    merges = tok.bpe_train(docs, n_merges=12)
    p = str(tmp_path / "merges")
    tok.merges_to_df(spark, merges).write.parquet(p)
    back = tok.merges_from_df(spark.read.parquet(p))
    assert back == merges
    a = {r.doc_id: tuple(r.pieces)
         for r in tok.bpe_encode(docs, merges, impl="arrow").collect()}
    b = {r.doc_id: tuple(r.pieces)
         for r in tok.bpe_encode(docs, back, impl="arrow").collect()}
    assert a == b


def test_unigram_ppl_tokens_col(spark, docs):
    """lm.unigram_perplexity(tokens_col=) scores over a precomputed piece
    stream; same math as the text path when the pieces ARE the words."""
    from towhee_spark.functions import lm
    from towhee_spark.functions.ranking import _toks

    words = docs.select("doc_id", _toks(F.col("text")).alias("ws"))
    via_tokens = {r.doc_id: (r.n_tokens, r.avg_nll)
                  for r in lm.unigram_perplexity(
                      words, tokens_col="ws").collect()}
    via_text = {r.doc_id: (r.n_tokens, r.avg_nll)
                for r in lm.unigram_perplexity(docs).collect()}
    assert via_tokens == via_text


def test_piece_id_table_ranking(spark):
    """Ids are 0-based (count DESC, piece ASC) ranks — the
    frequency-sorted vocab layout."""
    df = spark.createDataFrame(
        [(1, ["b", "a", "b"]), (2, ["c", "b"])], "doc_id long, pieces array<string>")
    ids = {r.piece: r.piece_id for r in tok.piece_id_table(df).collect()}
    assert ids == {"b": 0, "a": 1, "c": 2}  # b:3 wins; a/c tie→asc


def test_encode_ids_lockstep_and_roundtrip(spark, docs):
    """expr == arrow on the real corpus; ids decode back to the exact
    piece stream through the inverse table (lossless)."""
    v = tok.wordpiece_vocab(docs, n_words=24, n_suffix=8)
    p = tok.wordpiece_tokenize(docs, v, impl="arrow", max_word_chars=8)
    idt = tok.piece_id_table(p)
    e = {r.doc_id: (tuple(r.ids), r.n_tokens)
         for r in tok.encode_ids(p, idt, impl="expr").collect()}
    a = {r.doc_id: (tuple(r.ids), r.n_tokens)
         for r in tok.encode_ids(p, idt, impl="arrow").collect()}
    assert e == a and e
    inv = {r.piece_id: r.piece for r in idt.collect()}
    pieces = {r.doc_id: tuple(r.pieces) for r in p.collect()}
    for d, (ids, n) in e.items():
        assert len(ids) == n and -1 not in ids  # same-corpus: no misses
        assert tuple(inv[i] for i in ids) == pieces[d]


def test_encode_ids_foreign_vocab_and_empty(spark):
    """Pieces absent from a FOREIGN id table map to -1; empty/NULL piece
    arrays yield empty id arrays with n_tokens 0 on both impls."""
    p = spark.createDataFrame(
        [(1, ["x", "y"]), (2, []), (3, None)],
        "doc_id long, pieces array<string>")
    idt = spark.createDataFrame([("x", 0)], "piece string, piece_id int")
    for impl in ("expr", "arrow"):
        out = {r.doc_id: (None if r.ids is None else tuple(r.ids), r.n_tokens)
               for r in tok.encode_ids(p, idt, impl=impl).collect()}
        assert out[1] == ((0, -1), 2)
        assert out[2] == ((), 0)
        assert out[3] == ((), 0)  # NULL array ≡ empty (the tokenize rule)
    with pytest.raises(ValueError, match="impl"):
        tok.encode_ids(p, idt, impl="nope")


def test_chunk_ids_window_rules(spark):
    """chunk_ids shares chunk_text's arithmetic: starts stop at
    len−size+step−1 (no chunk fully inside its predecessor), short
    arrays emit ONE chunk, empty/NULL arrays emit ZERO chunks."""
    df = spark.createDataFrame(
        [(1, list(range(10))), (2, [7, 8]), (3, []), (4, None)],
        "doc_id long, ids array<int>")
    out = df.select(
        "doc_id", F.explode_outer(tok.chunk_ids("ids", size=4, overlap=2))
        .alias("c"))
    rows = {(r.doc_id, None if r.c is None else (r.c.start, tuple(r.c.part)))
            for r in out.collect()}
    # len=10, size=4, step=2 → last start ≤ len−size+step−1 = 7 → 0,2,4,6
    assert {(1, (0, (0, 1, 2, 3))), (1, (2, (2, 3, 4, 5))),
            (1, (4, (4, 5, 6, 7))), (1, (6, (6, 7, 8, 9))),
            (2, (0, (7, 8))), (3, None), (4, None)} == rows
    with pytest.raises(ValueError, match="overlap"):
        tok.chunk_ids("ids", size=4, overlap=4)


def test_chunk_ids_matches_chunk_text_boundaries(spark, docs):
    """On the real corpus, chunking the WHITESPACE token stream through
    chunk_ids must reproduce chunk_text's (doc, start) set exactly —
    the two ops share one window contract."""
    from towhee_spark.functions import text as txt
    from towhee_spark.functions.ranking import _toks

    a = {(r.doc_id, r.s) for r in docs.select(
        "doc_id", F.explode(txt.chunk_text("text", size=12, overlap=4))
        .alias("c")).select("doc_id", F.col("c.start").alias("s")).collect()}
    b = {(r.doc_id, r.s) for r in docs.select(
        "doc_id",
        F.explode(tok.chunk_ids(_toks(F.col("text")), size=12, overlap=4))
        .alias("c")).select("doc_id", F.col("c.start").alias("s")).collect()}
    assert a == b
