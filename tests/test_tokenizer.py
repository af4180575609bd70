"""BPE tokenizer (operators/tokenizer.py): deterministic training,
exact round-trips, merge-application semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from iceberg_geo_poc_spark.operators.tokenizer import (
    _apply_bpe,
    decode_tokens,
    encode_docs,
    train_bpe,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_train_learns_frequent_pairs_first(spark):
    # 'aa' dominates: the first merge must fuse ('a', 'a')
    docs = _docs(spark, ["aaaa aaaa aaaa", "ab ab", "b b b"])
    merges = train_bpe(docs, n_merges=3)
    assert merges[0] == ("a", "a")


def test_train_deterministic_ties(spark):
    docs = _docs(spark, ["xy xy", "uv uv"])  # equal pair counts
    m1 = train_bpe(docs, n_merges=2)
    m2 = train_bpe(docs.repartition(7), n_merges=2)
    assert m1 == m2  # lexicographic tie-break, partitioning-independent


def test_apply_bpe_rank_order():
    # lower-rank merge applies first even when it appears later in word
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert _apply_bpe("abc", ranks) == ["a", "bc", "▁"]


def test_roundtrip_exact_and_compression(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the the the the the",
        "",
        "single",
        "  spaced   out   words  ",
    ]
    docs = _docs(spark, texts)
    merges = train_bpe(docs, n_merges=50)
    dec = {r.doc_id: r for r in decode_tokens(encode_docs(docs, merges)).collect()}
    import re

    for i, t in enumerate(texts):
        norm = re.sub(" +", " ", t).strip()
        assert dec[i].decoded_text == norm, (i, dec[i].decoded_text)
        assert dec[i].n_words == (len(norm.split(" ")) if norm else 0)
    # 'the' (freq 9) must have collapsed to a single token
    enc = {r.doc_id: r for r in encode_docs(docs, merges).collect()}
    assert enc[1].n_tokens == 5


def test_untrained_words_fall_back_to_chars(spark):
    docs = _docs(spark, ["zzz zzz"])
    merges = train_bpe(docs, n_merges=0)
    enc = encode_docs(docs, merges).collect()[0]
    assert enc.n_tokens == 8  # 3 chars + end marker, twice
