"""Distributed BPE training pinned against an independent pure-Python
reference trainer (Sennrich get_stats + greedy left-to-right merge), plus
the plan property that matters at 100 TB: the corpus-scale word histogram
combines map-side."""

from collections import Counter

import __spark_entry__ as E
from ragflow_core16_spark.operators.training import (BPE_MERGES, bpe_train)

SF = "/root/testdata/sf0.001"


def _py_bpe_train(word_freq: dict, rounds: int):
    syms = {w: list(w) for w in word_freq}
    merges = []
    for rank in range(rounds):
        cnt = Counter()
        for w, f in word_freq.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (left, right), c = min(cnt.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, left + right, c))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out
    return merges


def _word_freq(spark):
    rows = (spark.read.parquet(f"{SF}/documents.parquet")
            .selectExpr("explode(split(text, ' ')) AS w")
            .filter("length(w) > 0").groupBy("w").count().collect())
    return {r["w"]: r["count"] for r in rows}


def test_merge_list_matches_python_reference(spark):
    want = _py_bpe_train(_word_freq(spark), BPE_MERGES)
    got = [(r["rank"], r["left"], r["right"], r["merged"],
            r["pair_freq"]) for r in bpe_train(spark, SF).collect()]
    assert got == want


def test_merges_deterministic(spark):
    a = bpe_train(spark, SF, rounds=6).collect()
    b = bpe_train(spark, SF, rounds=6).collect()
    assert a == b


def test_small_rounds_prefix_of_large(spark):
    small = [tuple(r) for r in bpe_train(spark, SF, rounds=4).collect()]
    large = [tuple(r) for r in bpe_train(spark, SF, rounds=8).collect()]
    assert large[:4] == small


def test_word_histogram_combines_map_side(spark):
    # the ONLY corpus-scale stage must show a partial_count before the
    # exchange — at 10^12 rows everything else rides on |distinct words|
    from pyspark.sql import functions as F
    d = (spark.read.parquet(f"{SF}/documents.parquet")
         .select(F.explode(F.split("text", " ")).alias("word"))
         .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    simple = d._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"))
    assert "partial_count" in simple


def test_registered_with_unrolled_oracle():
    assert "bpe_train" in E._registry()
    # the fixed round count lets the oracle unroll one CTE stage per
    # merge — bpe_train is oracle-backed despite the iterative argmax
    sql = E.oracle_sql()["bpe_train"]
    assert f"m{BPE_MERGES - 1} " in sql and "list_reduce" in sql


def test_trained_vocab_roundtrip_through_encoder(spark, tmp_path):
    """Train on the corpus, dump a .tiktoken vocab, reload it into the
    tiktoken-style encoder: lowest-rank-first merging must reproduce the
    trainer's own final segmentation for EVERY distinct corpus word (the
    GPT-2 rank-order/merge-order correspondence, checked end-to-end)."""
    from ragflow_core16_spark.textnorm.bpe import (BpeEncoder, dump_vocab,
                                                   load_vocab,
                                                   vocab_from_merges)
    wf = _word_freq(spark)
    merges = _py_bpe_train(wf, BPE_MERGES)
    spark_merges = [tuple(r) for r in bpe_train(spark, SF).collect()]
    assert spark_merges == merges

    # trainer-side final segmentation (re-run the merge application)
    syms = {w: list(w) for w in wf}
    for _rank, left, right, _m, _c in merges:
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            syms[w] = out

    path = str(tmp_path / "trained.tiktoken")
    dump_vocab(vocab_from_merges(spark_merges), path)
    enc = BpeEncoder(load_vocab(path))
    for w, want in syms.items():
        got = [t.decode() for t in enc.encode_piece(w.encode())]
        assert got == want, w


def test_merge_expr_escapes_quoted_symbols(spark):
    # corpora with apostrophes/backslashes must not break the SQL literal
    from pyspark.sql import functions as F
    from ragflow_core16_spark.operators.training import _bpe_merge_expr
    df = spark.createDataFrame([(["don", "'", "t"],), (["a", "\\", "b"],)],
                               "syms array<string>")
    out = df.select(
        F.expr(_bpe_merge_expr("'", "t")).alias("a"),
        F.expr(_bpe_merge_expr("\\", "b")).alias("b")).collect()
    assert out[0]["a"] == ["don", "'t"]
    assert out[1]["b"] == ["a", "\\b"]


def test_vocab_collision_keeps_earliest_rank():
    from ragflow_core16_spark.textnorm.bpe import vocab_from_merges
    ranks = vocab_from_merges([(5, "ab", "c", "abc", 9),
                               (9, "a", "bc", "abc", 4)])
    assert ranks[b"abc"] == 256 + 5
