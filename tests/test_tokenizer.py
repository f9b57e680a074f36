"""Differential tests for the BPE tokenizer-fit operators.

doc_bpe_learn_merges has no DuckDB oracle (merge application is a fold,
which DuckDB's same-type list_reduce cannot express), so correctness is
established against an independent pure-Python reference BPE — the
textbook word-frequency implementation (Sennrich et al. 2016) — on the
real testdata corpus, plus hand-checked fixtures.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from finalpipeline_spark.queries.tokenizer import N_MERGES, learn_bpe_merges
from finalpipeline_spark.tables import load_table


def _ref_tokens(text: str) -> list[str]:
    return [w for w in re.sub(r"[^A-Za-z0-9]+", " ", text.lower()).split() if w]


def _ref_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str, int]]:
    """Pure-Python reference BPE over the word-frequency table, greedy
    left-to-right merge application, (count desc, pair asc) tiebreak."""
    vocab: Counter[str] = Counter()
    for t in texts:
        vocab.update(_ref_tokens(t))
    seqs = {w: list(w) for w in vocab}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pc: Counter[tuple[str, str]] = Counter()
        for w, cnt in vocab.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += cnt
        if not pc:
            break
        (left, right), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((left, right, cnt))
        for w, s in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def test_learn_matches_reference_on_testdata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    expected = _ref_bpe(texts, N_MERGES)
    got = learn_bpe_merges(spark, docs, N_MERGES)
    assert got == expected


def test_learn_fixture_hand_checked(spark):
    # "low" x5, "lower" x2: classic BPE example — first merges are
    # driven by the shared "lo…w" prefix mass.
    texts = ["low " * 5 + "lower " * 2]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = learn_bpe_merges(spark, docs, 3)
    assert got == _ref_bpe(texts, 3)
    # first merge must be the highest-mass pair ('l','o'): 7 occurrences
    assert got[0][:2] == ("l", "o") and got[0][2] == 7


def test_merge_fold_nonoverlapping(spark):
    # 'aaaa' must merge to ['aa','aa'], never the overlapping ['aa','aa','aa'..]
    texts = ["aaaa"]
    docs = spark.createDataFrame([(0, "aaaa")], "doc_id long, text string")
    got = learn_bpe_merges(spark, docs, 2)
    assert got == _ref_bpe(texts, 2)
    assert got[0][:2] == ("a", "a")


@pytest.mark.parametrize("n", [0, 1])
def test_learn_degenerate(spark, n):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    # single 1-char word: no pairs exist, learner must stop cleanly
    assert learn_bpe_merges(spark, docs, n) == []


def test_encode_matches_reference(spark, sf_dir):
    from finalpipeline_spark.queries.tokenizer import bpe_encode

    docs = load_table(spark, sf_dir, "documents").limit(50)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    merges = _ref_bpe(list(texts.values()), 4)

    def ref_encode(text: str) -> list[str]:
        out: list[str] = []
        for w in _ref_tokens(text):
            s = list(w)
            for left, right, _ in merges:
                nxt: list[str] = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        nxt.append(left + right)
                        i += 2
                    else:
                        nxt.append(s[i])
                        i += 1
                s = nxt
            out.extend(s)
        return out

    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        assert got[doc_id] == ref_encode(text), doc_id
