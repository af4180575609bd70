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


def test_roundtrip_with_literal_markers(spark):
    # text containing the '▁' end-of-word marker and the U+E000 escape
    # char itself must still round-trip exactly (they occur in real web
    # corpora; encoding escapes them, the codegen decode chain restores)
    texts = [
        "price▁tag under▁score",
        "pua  char",
        "mixed ▁▁ run",
        "E already-looks-escaped ▁U",
    ]
    docs = _docs(spark, texts)
    merges = train_bpe(docs, n_merges=30, min_freq=1)
    dec = {r.doc_id: r for r in decode_tokens(encode_docs(docs, merges)).collect()}
    for i, t in enumerate(texts):
        assert dec[i].decoded_text == t, (i, repr(dec[i].decoded_text))


def _naive_train(word_freqs, n_merges):
    """In-test reference trainer: full pair recount every merge (the
    textbook O(n_merges x vocab) formulation) — pins the incremental
    index implementation to identical output."""
    from collections import Counter

    vocab = {tuple(w) + ("▁",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, freq in vocab.items():
            for p in zip(syms, syms[1:]):
                pc[p] += freq
        if not pc:
            break
        best_n = max(pc.values())
        if best_n < 2:
            break
        best = min(p for p, c in pc.items() if c == best_n)
        merges.append(best)
        new_vocab = {}
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def test_incremental_update_matches_naive_recount(spark):
    texts = [
        "the cat sat on the mat the cat",
        "banana bandana ban ban banana",
        "aaa aab aba abb bbb aaa aaa",
        "overlap overlap overlapping laps",
    ]
    docs = _docs(spark, texts)
    fast = train_bpe(docs, n_merges=60, min_freq=1)
    freqs: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    assert fast == _naive_train(freqs, 60)


def test_vocab_caps_bound_the_collect(spark):
    texts = ["common common common common rare", "common unique1 unique2"]
    docs = _docs(spark, texts)
    # min_freq floor drops the singletons; merges come from 'common' only
    capped = train_bpe(docs, n_merges=10, min_freq=2)
    assert capped == _naive_train({"common": 5}, 10)
    # max_vocab keeps only the most frequent word (deterministic order)
    top1 = train_bpe(docs, n_merges=10, min_freq=1, max_vocab=1)
    assert top1 == _naive_train({"common": 5}, 10)


def test_roundtrip_property_arbitrary_unicode(spark):
    """decode(encode(x)) == whitespace-normalized x for ARBITRARY text,
    including literal end-of-word markers, the escape char itself, and
    hostile whitespace runs (the documented precondition)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import HealthCheck, given, settings, strategies as st

    import re

    text_strategy = st.lists(
        st.text(
            alphabet=st.one_of(
                st.characters(min_codepoint=32, max_codepoint=0x2FFF),
                st.sampled_from("▁ EU  "),
            ),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=text_strategy)
    def check(texts):
        docs = _docs(spark, texts)
        merges = train_bpe(docs, n_merges=20, min_freq=1)
        dec = {
            r.doc_id: r.decoded_text
            for r in decode_tokens(encode_docs(docs, merges)).collect()
        }
        for i, t in enumerate(texts):
            # normalize ASCII spaces only: unicode whitespace (NBSP,
            # en-quad...) is word content to a space-delimited tokenizer
            norm = re.sub(" +", " ", t).strip(" ")
            assert dec[i] == norm, (repr(t), repr(dec[i]))

    check()


# -- unigram (SentencePiece-style) family ------------------------------------


def test_unigram_viterbi_picks_max_likelihood(spark):
    """Hand-checkable lattice: with P(ab) >> P(a)P(b) the Viterbi
    segmentation takes the merged piece; flip the odds and it splits."""
    from iceberg_geo_poc_spark.operators import unigram as U

    import math

    merged = {"ab": math.log(0.5), "a": math.log(0.2), "b": math.log(0.2),
              "▁": math.log(0.1)}
    assert U._viterbi("ab▁", merged, 2) == ["ab", "▁"]
    split = {"ab": math.log(0.01), "a": math.log(0.45), "b": math.log(0.44),
             "▁": math.log(0.1)}
    assert U._viterbi("ab▁", split, 2) == ["a", "b", "▁"]


def test_unigram_roundtrip_and_pruning(spark):
    from iceberg_geo_poc_spark.operators import unigram as U
    from iceberg_geo_poc_spark.operators.tokenizer import decode_tokens

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cats and dogs and cats",
        "",
        "  spaced   out  ",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id LONG, text STRING"
    )
    vocab = U.train_unigram(docs, vocab_size=30, min_freq=1)
    assert len(vocab) <= 30 + sum(1 for p, _ in vocab if len(p) == 1)
    # coverage invariant: every training character is a piece
    pieces = {p for p, _ in vocab}
    for t in texts:
        for ch in t.replace(" ", ""):
            assert ch in pieces
    import re

    dec = {
        r.doc_id: r.decoded_text
        for r in decode_tokens(U.encode_unigram_docs(docs, vocab)).collect()
    }
    for i, t in enumerate(texts):
        assert dec[i] == re.sub(" +", " ", t).strip(" ")


def test_unigram_unseen_chars_roundtrip(spark):
    """Characters absent from training still decode exactly (per-char
    fallback at floor probability)."""
    from iceberg_geo_poc_spark.operators import unigram as U
    from iceberg_geo_poc_spark.operators.tokenizer import decode_tokens

    train = spark.createDataFrame(
        [(0, "plain ascii text only")], "doc_id LONG, text STRING"
    )
    vocab = U.train_unigram(train, vocab_size=20, min_freq=1)
    probe = spark.createDataFrame(
        [(0, "tschüß Ωmega ▁marker esc")], "doc_id LONG, text STRING"
    )
    dec = decode_tokens(U.encode_unigram_docs(probe, vocab)).collect()[0]
    assert dec.decoded_text == "tschüß Ωmega ▁marker esc"


def test_unigram_determinism(spark):
    from iceberg_geo_poc_spark.operators import unigram as U

    texts = [(i, f"doc {i % 7} repeated words words {i % 3}") for i in range(40)]
    docs = spark.createDataFrame(texts, "doc_id LONG, text STRING")
    v1 = U.train_unigram(docs, vocab_size=50, min_freq=1)
    v2 = U.train_unigram(docs.repartition(7), vocab_size=50, min_freq=1)
    assert [p for p, _ in v1] == [p for p, _ in v2]
    for (_, a), (_, b) in zip(v1, v2):
        assert abs(a - b) < 1e-9
