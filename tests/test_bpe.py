"""BPE merge training: Spark vs DuckDB oracle vs a textbook reference
implementation (Sennrich et al. 2016 `learn_bpe` semantics)."""

from __future__ import annotations

import collections
import re

import duckdb
import pytest

from robosystems_spark.operators.bpe import (
    bpe_apply_merges,
    bpe_oracle_sql,
    bpe_token_counts,
    bpe_train,
    bpe_vocab,
)

ROWS = [
    (1, "low low low lower lower newest newest newest newest widest"),
    (2, "aaaa aaaa aaaa banana banana bandana"),
    (3, "low newest widest aaaa banana"),
]


def _textbook_bpe(words: dict[str, int], n: int):
    """Reference implementation: dict-of-symbol-sequences, pair counts
    with overlaps, greedy left-to-right merge via boundary-safe regex.
    Tie-break: count desc, then lexicographically smallest pair."""
    vocab = collections.Counter()
    for w, f in words.items():
        vocab[" ".join(list(w)) + " </w>"] += f
    merges = []
    for _ in range(n):
        pairs = collections.Counter()
        for seq, f in vocab.items():
            syms = seq.split()
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        mx = max(pairs.values())
        a, b = sorted(p for p, c in pairs.items() if c == mx)[0]
        merges.append((a, b, mx))
        pat = re.compile(r"(?<!\S)" + re.escape(a + " " + b) + r"(?!\S)")
        new = collections.Counter()
        for seq, f in vocab.items():
            new[pat.sub(a + b, seq)] += f
        vocab = new
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id INT, text STRING")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, '{t}')" for i, t in ROWS)
        + ") t(doc_id, text)"
    )
    return con


def _words() -> dict[str, int]:
    words = collections.Counter()
    for _, t in ROWS:
        for w in t.lower().split():
            words[w] += 1
    return dict(words)


def test_train_matches_textbook_and_oracle(spark, docs, duck):
    got = [
        tuple(r)
        for r in bpe_train(docs, n_merges=6).orderBy("merge_rank").collect()
    ]
    ref, _ = _textbook_bpe(_words(), 6)
    assert [(a, b, c) for _, a, b, c in got] == ref
    oracle = [
        tuple(r)
        for r in duck.execute(
            bpe_oracle_sql(n_merges=6) + " ORDER BY merge_rank"
        ).fetchall()
    ]
    assert got == oracle


def test_parity_rule_on_identical_symbol_runs(spark):
    # 'aaaa' -> candidates at 3 consecutive positions; greedy merges
    # positions 1 and 3 only: a a a a </w> -> aa aa </w>.
    docs = spark.createDataFrame([(1, "aaaa")], "doc_id INT, text STRING")
    seq = bpe_apply_merges(docs, [("a", "a")])
    syms = [
        r["sym"] for r in seq.orderBy("pos").collect()
    ]
    assert syms == ["aa", "aa", "</w>"]


def test_vocab_matches_textbook_final_state(spark, docs):
    _, ref_vocab = _textbook_bpe(_words(), 6)
    ref_syms = collections.Counter()
    for seq, f in ref_vocab.items():
        for s in seq.split():
            ref_syms[s] += f
    got = {
        r["sym"]: r["total_freq"]
        for r in bpe_vocab(docs, n_merges=6).collect()
    }
    assert got == dict(ref_syms)


def test_token_counts_consistent(spark, docs):
    rows = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_token_counts(docs, n_merges=6).collect()
    }
    # doc 1: 10 words; BPE tokens strictly fewer than chars+EOW, at
    # least n_words (every word is >= 1 token).
    assert rows[1][0] == 10
    for n_words, n_toks in rows.values():
        assert n_toks >= n_words


def test_apply_merges_equals_train_final_state(spark, docs):
    trained = bpe_train(docs, n_merges=5).collect()
    merges = [(r["left_sym"], r["right_sym"]) for r in trained]
    via_apply = sorted(
        (r["word"], r["pos"], r["sym"])
        for r in bpe_apply_merges(docs, merges).collect()
    )
    # final state from the training loop itself
    from robosystems_spark.operators.bpe import _train_loop

    seq, _ = _train_loop(docs, 5, "text")
    via_train = sorted(
        (r["word"], r["pos"], r["sym"]) for r in seq.collect()
    )
    assert via_apply == via_train


def test_early_stop_when_pairs_run_dry(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id INT, text STRING")
    # 'ab' -> a b </w>: only 3 merges possible before one symbol left.
    out = bpe_train(docs, n_merges=10).collect()
    assert 0 < len(out) < 10


def test_oracle_carries_table_when_corpus_dries(spark):
    """When merges exhaust before n_merges, the oracle must carry the
    symbol table forward (not erase it via an empty cross join) —
    matching the training loop's early break."""
    import duckdb

    from robosystems_spark.operators.bpe import bpe_oracle_sql, bpe_vocab

    docs = spark.createDataFrame([(1, "ab ab"), (2, "ab")], "doc_id INT, text STRING")
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES (1, 'ab ab'), (2, 'ab')) t(doc_id, text)"
    )
    s = sorted(tuple(r) for r in bpe_vocab(docs, n_merges=10).collect())
    o = sorted(
        tuple(r)
        for r in con.execute(bpe_oracle_sql(n_merges=10, mode="vocab")).fetchall()
    )
    assert s == o and len(s) == 1  # fully merged: one 'ab</w>' symbol
