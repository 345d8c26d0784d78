"""Stage-level profile of the wordpiece→encode→pack gate chain (guide §1.4:
noop-sink isolation). Times each stage of q_packed_shards/q_packed_spans/
q_pack_wp at sf0.1 on a fresh local[32] session so the expensive *_full bench
rows decompose. Read-only: no bench.py change, numbers cited in
OPTIMIZATION_r06.md.

Usage: python tools/profile_pack_chain.py [sf_dir]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from towhee_spark.session import get_spark  # noqa: E402
from towhee_spark.functions import tokenize as tok  # noqa: E402
from towhee_spark.functions.packing import materialize_packs  # noqa: E402


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile_pack_chain", master=f"local[{cpus}]")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    print(f"docs: {n}")

    def timed(name, fn, warm=1):
        best = None
        for _ in range(warm + 1):
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"{name:28s} {best:7.3f} s")
        return out

    spark.sparkContext.setJobDescription("warmup")
    force(docs.select(F.length("text").alias("l")))

    spark.sparkContext.setJobDescription("vocab_train")
    vocab = timed("wordpiece_vocab", lambda: tok.wordpiece_vocab(
        docs, n_words=24, n_suffix=8))

    spark.sparkContext.setJobDescription("wp_expr")
    timed("wp_tokenize_expr(force)", lambda: force(tok.wordpiece_tokenize(
        docs, vocab, impl="expr", max_word_chars=8)
        .select("doc_id", "pieces")))
    spark.sparkContext.setJobDescription("wp_arrow")
    timed("wp_tokenize_arrow(force)", lambda: force(tok.wordpiece_tokenize(
        docs, vocab, impl="arrow", max_word_chars=8)
        .select("doc_id", "pieces")))

    # the real gate shape: cache pieces, id-table collect, encode, pack
    def full(impl):
        pieces = tok.wordpiece_tokenize(
            docs, vocab, impl=impl, max_word_chars=8
        ).select("doc_id", "pieces").cache()
        t0 = time.perf_counter()
        idt = tok.piece_id_table(pieces)
        enc = tok.encode_ids(pieces, idt, impl="expr").select(
            "doc_id", "ids").cache()
        t1 = time.perf_counter()
        force(materialize_packs(enc, seq_len=64).select(
            "pack_id", "n_fill", "ids"))
        t2 = time.perf_counter()
        print(f"  [{impl}] idtable+encode-plan {t1-t0:6.3f}  pack-run {t2-t1:6.3f}")
        pieces.unpersist()
        enc.unpersist()

    spark.sparkContext.setJobDescription("full_expr")
    timed("packed_shards_like(expr)", lambda: full("expr"), warm=1)
    spark.sparkContext.setJobDescription("full_arrow")
    timed("packed_shards_like(arrow)", lambda: full("arrow"), warm=1)
    spark.stop()


if __name__ == "__main__":
    main()
