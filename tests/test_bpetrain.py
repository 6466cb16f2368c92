"""Distributed BPE training (operators/bpetrain) vs the pure-Python
oracle (extractor/bpe.learn_merges_from_freqs) — Sennrich et al. 2016
Alg. 1. The reference ships a pre-trained HF vocab
(doc_processor.py:89-137); training is the half you need at corpus
scale, and the pure trainer doubles as the Spark job's oracle.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from historicaldatadocumentparsersystem_spark.extractor import bpe  # noqa: E402
from historicaldatadocumentparsersystem_spark.operators import bpetrain  # noqa: E402


def _pure_merges(texts, n):
    """The advertised oracle IS the oracle: ``bpe.learn_merges``
    carries the trainer's printable-ASCII word gate itself (a
    review finding fixed in round 4 — the gate is part of the
    algorithm's contract, not a Spark-side detail)."""
    return bpe.learn_merges(texts, n)


def test_learn_merges_known_vector():
    # freq(es)=9 beats freq(lo|we|st...)<=8; trace of the first ranks
    # is checkable by hand ('newest' x6 + 'widest' x3 share 'es').
    corpus = ["low low low low low lower lower newest newest newest "
              "newest newest newest widest widest widest"]
    merges = bpe.learn_merges(corpus, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_learn_merges_ties_break_lexicographic():
    # 'ab' and 'cd' both appear twice; (a,b) < (c,d) must win rank 0.
    merges = bpe.learn_merges(["cd cd ab ab"], 1)
    assert merges[0] == ("a", "b")


def test_learn_merges_early_stop_on_full_collapse():
    # single word fully collapses after 2 merges; no pair remains
    merges = bpe.learn_merges(["ab ab"], 10)
    assert merges == (("a", "b"), ("ab", "</w>"))


def test_apply_merge_greedy_nonoverlapping():
    # 'aaa': left-to-right pass merges positions (0,1), leaves the tail
    assert bpe._apply_merge(("a", "a", "a"), ("a", "a")) == ("aa", "a")


def test_learned_merges_plug_into_tokenizer():
    # rank-order training application == greedy lowest-rank inference
    # (the standard BPE equivalence the tokenizer relies on)
    corpus = ["the cat sat on the mat", "the bat and the rat", "a cat"]
    merges = bpe.learn_merges(corpus, 16)
    tk = bpe.BPETokenizer(merges)
    for text in corpus:
        for word in bpe._PRETOK.findall(text.lower()):
            syms = tuple(word) + ("</w>",)
            for pair in merges:
                syms = bpe._apply_merge(syms, pair)
            assert tk.bpe_word(word) == syms


@pytest.mark.usefixtures("spark")
def test_spark_trainer_matches_pure_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "low lower lowest newer newest wide wider widest",
        "aaa aaa aaa bbb ab ab the the the and and 123 456!",
        "e e e e e e e e",   # drives a full word collapse (1-symbol
                             # words must contribute no pairs — the
                             # ANSI sequence(1,0) edge)
        "caf\xe9 na\xefve \xa0 weird—dash",  # non-ASCII filtered
        "", None,
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [(r.left_sym, r.right_sym) for r in
           bpetrain.learn_bpe_merges(df, n_merges=24)
           .orderBy("merge_rank").collect()]
    assert got == list(_pure_merges(texts, 24))


@pytest.mark.usefixtures("spark")
def test_spark_trainer_word_freqs_match(spark):
    texts = ["Hello, hello WORLD 42 42 42", "world hello éclair"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.word: r.freq for r in
           bpetrain.word_freq_table(df).collect()}
    want = {}
    for t in texts:
        for w in bpe._PRETOK.findall(t.lower()):
            if all(" " <= c <= "~" for c in w):
                want[w] = want.get(w, 0) + 1
    assert got == want
