"""BPE tokenizer training (operators/bpe) — greedy-rewrite semantics and
learning correctness.

The oracle gate proves Spark == DuckDB corpus-wide, but the corpus words
never contain self-adjacent pair runs ('a a a'), where greedy
left-to-right scan order is the discriminating case — these tests pin all
three implementations (Spark fold, DuckDB reduce, pure-Python reference)
on exactly those inputs."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from api_ocr_spark.operators import bpe

def ref_merge(symbols: list[str], lhs: str, rhs: str,
              merged: str) -> list[str]:
    """Sennrich et al. 2016 greedy left-to-right non-overlapping rewrite."""
    out: list[str] = []
    i = 0
    while i < len(symbols):
        if (i + 1 < len(symbols) and symbols[i] == lhs
                and symbols[i + 1] == rhs):
            out.append(merged)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


CASES = [
    (["a", "a", "a"], "a", "a"),            # odd self-run: (1,2) fuse, 3 survives
    (["a", "a", "a", "a"], "a", "a"),        # even self-run: two fuses
    (["a", "a", "a", "a", "a"], "a", "a"),   # 5-run: aa aa a
    (["x", "a", "a", "a", "a"], "a", "a"),   # run after a non-member
    (["a", "b", "a", "b", "a"], "a", "b"),   # alternating pair
    (["a", "b", "b", "a"], "b", "b"),
    (["q", "</w>"], "a", "b"),               # rule absent from word
    (["</w>"], "a", "b"),                    # single-symbol word
]


def test_spark_fold_matches_reference_greedy(spark):
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(CASES)],
        "i long, symbols array<string>")
    for case_idx, (syms, lhs, rhs) in enumerate(CASES):
        got = (df.where(F.col("i") == case_idx)
               .select(bpe.merge_pair(F.col("symbols"), lhs, rhs, lhs + rhs)
                       .alias("m")).collect()[0].m)
        assert got == ref_merge(syms, lhs, rhs, lhs + rhs), (syms, lhs, rhs)


def test_duckdb_reduce_matches_reference_greedy():
    con = duckdb.connect()
    for syms, lhs, rhs in CASES:
        got = con.execute(
            """
            SELECT reduce(list_transform($syms::VARCHAR[], s -> [s]),
              (acc, x) -> CASE WHEN acc[-1] = $lhs AND x[1] = $rhs
                          THEN list_append(acc[1:length(acc) - 1], $m)
                          ELSE list_concat(acc, x) END)
            """, {"syms": syms, "lhs": lhs, "rhs": rhs, "m": lhs + rhs},
        ).fetchone()[0]
        assert got == ref_merge(syms, lhs, rhs, lhs + rhs), (syms, lhs, rhs)


def ref_learn(word_counts: dict[str, int], n_merges: int):
    """Pure-Python BPE learner (the paper's algorithm, census-driven)."""
    vocab = {w: list(w) + [bpe.END_OF_WORD] for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + word_counts[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (lhs, rhs), cnt = best
        merged = lhs + rhs
        merges.append((lhs, rhs, merged, cnt))
        vocab = {w: ref_merge(s, lhs, rhs, merged) for w, s in vocab.items()}
    return merges, vocab


def test_bpe_learn_matches_reference_learner(spark):
    # 'aaa' words plant self-pair runs inside real learning rounds
    word_counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3, "aaa": 4}
    text = " ".join(" ".join([w] * c) for w, c in word_counts.items())
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    merges, vocab = bpe.bpe_learn(docs, n_merges=8)
    ref_merges, ref_vocab = ref_learn(word_counts, 8)
    assert merges == ref_merges
    got_vocab = {r.word: list(r.symbols) for r in vocab.collect()}
    assert got_vocab == ref_vocab


def test_merge_table_and_subword_census_shapes(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "ab cd cd")], "doc_id long, text string")
    mt = bpe.merge_table(spark, docs, n_merges=2).collect()
    assert [r.merge_rank for r in mt] == [1, 2]
    assert mt[0].lhs == "a" and mt[0].rhs == "b" and mt[0].merged == "ab"
    assert mt[0].pair_count == 4
    sub = bpe.subword_census(docs, n_merges=2, k=10)
    rows = {r.token: r.n_occurrences for r in sub.collect()}
    # after (a,b)->ab and ab+</w>/cd merges the census stays consistent:
    # every word's symbols sum to the corpus word count
    assert sum(rows.values()) == sum(
        len(s) for r in bpe.bpe_learn(docs, 2)[1].collect()
        for s in [r.symbols] for _ in range(r.cnt))


def test_degenerate_single_symbol_corpus_stops_early(spark):
    # every word is one char: only (char, </w>) pairs exist; after those
    # merge, each word is a single symbol and learning must stop early
    docs = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    merges, vocab = bpe.bpe_learn(docs, n_merges=10)
    assert len(merges) == 2  # (a,</w>) then (b,</w>)
    assert all(len(r.symbols) == 1 for r in vocab.collect())


if __name__ == "__main__":
    import sys
    sys.exit(pytest.main([__file__, "-x", "-q"]))
