"""Independent reference for the BPE merge-training loop.

The oracle-authorship discipline (VERDICT r5 wrong-#2): every oracle
whose semantics rest on an equivalence argument ships an INDEPENDENT
implementation in the same commit. text_bpe_train_merges claims that a
leftmost non-overlapping string replace over the framed representation
(<US>sym<US> per symbol) equals classic BPE's greedy left-to-right
merge scan (Sennrich et al. 2016, algorithm 1). This file implements
the paper's algorithm directly — symbol TUPLES and an index scan, no
strings, no frames, no Spark — and pins both the learned merge table
on the real fixture corpus and the cascade/overlap edge cases.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from clickhouse_aggregation_spark.operators.text import (
    BPE_MERGE_ROUNDS, _US, _bpe_apply, _bpe_round_top, _framed_vocab,
    q_text_bpe_train_merges,
)
from clickhouse_aggregation_spark.sources.tables import load_table


def classic_bpe(word_freqs: dict[str, int], rounds: int):
    """Sennrich alg. 1 verbatim: vocab of symbol tuples, weighted pair
    counts, argmax merge (tie: ascending framed pair key, matching the
    query's ORDER BY pair), leftmost greedy merge scan."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, f in word_freqs.items():
        vocab[tuple(w)] = vocab.get(tuple(w), 0) + f
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        (x, y), c = min(counts.items(),
                        key=lambda kv: (-kv[1], kv[0][0] + _US + kv[0][1]))
        merges.append((x, y, c))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == x
                        and syms[i + 1] == y):
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + f
        vocab = new_vocab
    return merges


def _spark_merges_from_words(spark, words: list[str], rounds: int):
    docs = spark.createDataFrame([(0, " ".join(words))],
                                 "doc_id long, text string")
    vocab = _framed_vocab(docs)
    got = []
    for r in range(1, rounds + 1):
        top = _bpe_round_top(vocab)
        row = top.first()
        got.append((row["x"], row["y"], row["pair_count"]))
        if r < rounds:
            vocab = _bpe_apply(vocab, top)
    return got


def test_query_matches_classic_bpe_on_fixture(spark, sf_oracle_dir):
    docs = load_table(spark, sf_oracle_dir, "documents")
    freqs = {
        r["word"]: r["freq"]
        for r in (docs.select(F.explode(F.split("text", " ")).alias("word"))
                  .filter(F.length("word") >= 2)
                  .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
                  .collect())
    }
    exp = classic_bpe(freqs, BPE_MERGE_ROUNDS)
    got = [(r["merge_left"], r["merge_right"], r["pair_count"])
           for r in q_text_bpe_train_merges(spark, sf_oracle_dir)
           .orderBy("round").collect()]
    assert got == exp


@pytest.mark.parametrize("words,rounds", [
    # cascade: 'th' learned first, then 'th'+'e' -> multi-char merge
    (["the"] * 10 + ["than"] * 6 + ["then"] * 5 + ["he"] * 2, 3),
    # overlap: 'aaaa' must merge greedily to (aa, aa), 'aaa' to (aa, a)
    (["aaaa"] * 8 + ["aaa"] * 5 + ["ab"] * 3, 3),
    # merged symbol becomes BOTH halves of the next pair immediately
    # (2 rounds: the corpus has no pairs left after merging xy+xy)
    (["xyxy"] * 7 + ["xy"] * 4, 2),
])
def test_framed_replace_equals_classic_scan(spark, words, rounds):
    freqs: dict[str, int] = {}
    for w in words:
        freqs[w] = freqs.get(w, 0) + 1
    exp = classic_bpe(freqs, rounds)
    got = _spark_merges_from_words(spark, words, rounds)
    assert got == exp
    # the cascade cases must actually produce a multi-char symbol in a
    # later merge, or the test proves nothing about framing
    assert any(len(x) > 1 or len(y) > 1 for x, y, _ in exp)
