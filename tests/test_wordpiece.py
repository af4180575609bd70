"""WordPiece tokenizer lifecycle tests (operators/wordpiece.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_geo_poc_spark.operators import wordpiece as WP


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox the quick brown fox"),
        (2, "hashes like ## and # survive round trips #tag"),
        (3, ""),
        (4, "   spaces   collapse   "),
        (5, "unique"),
        (6, "the the the the quick quick quick"),
        (7, "\uE001 private use escape char literal \uE001E"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_train_is_deterministic_and_scored(docs):
    a = WP.train_wordpiece(docs, n_merges=30)
    b = WP.train_wordpiece(docs.repartition(7), n_merges=30)
    assert a == b
    assert len(a) > 0
    # every learned piece is at least two visible chars long
    assert all(len(p.lstrip("#")) >= 2 or p.startswith("##") for p in a)


def test_round_trip_every_doc(docs):
    pieces = WP.train_wordpiece(docs, n_merges=50, min_freq=1)
    enc = WP.encode_docs(docs, pieces)
    dec = WP.decode_tokens(enc)
    got = {
        r["doc_id"]: r["decoded_text"]
        for r in dec.collect()
    }
    import re

    for r in docs.collect():
        norm = re.sub(" +", " ", r["text"] or "").strip()
        assert got[r["doc_id"]] == norm, r["doc_id"]


def test_greedy_longest_match():
    vocab = frozenset(["abc", "##de", "ab"])
    assert WP._encode_word("abcde", vocab, 4) == ["abc", "##d", "##e"] or \
        WP._encode_word("abcde", vocab, 4) == ["abc", "##de"]
    # longest match wins: abc (3) preferred over ab (2)
    assert WP._encode_word("abcde", vocab, 4)[0] == "abc"
    # continuation matching uses the ## form
    assert WP._encode_word("xde", vocab, 4) == ["x", "##de"]


def test_corpus_compression(docs):
    pieces = WP.train_wordpiece(docs, n_merges=50, min_freq=1)
    enc = WP.encode_docs(docs, pieces)
    row = enc.agg(F.sum("n_tokens").alias("nt")).collect()[0]
    chars = sum(
        len((r["text"] or "").replace(" ", ""))
        for r in docs.collect()
    )
    assert row["nt"] < chars


def test_empty_and_whitespace_docs(docs):
    pieces = WP.train_wordpiece(docs, n_merges=10, min_freq=1)
    enc = WP.encode_docs(docs, pieces)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert rows[3]["n_tokens"] == 0 and rows[3]["n_words"] == 0
    assert rows[4]["n_words"] == 2
