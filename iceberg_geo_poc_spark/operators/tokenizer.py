"""Byte-pair-encoding tokenizer — train + encode + decode, Spark-first.

Token counting for corpus budgeting already exists (operators/text.py);
this module adds the real thing: BPE TRAINING over a corpus and exact
ENCODE/DECODE with the learned merges — the tokenizer lifecycle every
LM data pipeline runs before packing sequences.

Scale shape (the part that must survive 100 TB):
- The DISTRIBUTED stage is word counting: one explode + partial-agg
  groupBy, shuffling one row per DISTINCT word.  The driver collect is
  BOUNDED BY CONSTRUCTION: a ``min_freq`` floor and a deterministic
  ``ORDER BY freq DESC, word LIMIT max_vocab`` are pushed into the
  Spark plan, so even a 100 TB web corpus (whose distinct-"word" table
  — URLs, hashes, junk — is billions of rows) collects at most
  ``max_vocab`` rows.  This mirrors how production BPE trainers work:
  corpus-level work happens once, the merge loop then operates on the
  capped word-frequency table.
- The merge LOOP is driver-side over that bounded table, with the
  classic INCREMENTAL pair-count update: a pair->words occurrence
  index is maintained so each merge touches only the words that
  actually contain the merged pair (not the whole vocabulary), and
  pair counts are adjusted by delta rather than recounted.
  Determinism: ties broken by lexicographic pair order.
- ENCODING is a broadcast of the merge ranks + one pandas batch pass
  per partition (apply merges lowest-rank-first per word); decoding is
  pure string concat — both embarrassingly parallel.

Round-trip contract: ``decode(encode(text))`` equals text up to
WHITESPACE NORMALIZATION — runs of spaces collapse to one and
leading/trailing spaces are trimmed, because words are split on spaces
and rejoined with single spaces (the precondition every
space-delimited tokenizer shares; normalize first if exactness over
runs of spaces matters).  Within that precondition the round-trip is
EXACT for arbitrary text: literal occurrences of the end-of-word
marker U+2581 (which does occur in web corpora) and of the private-use
escape char are escaped during encoding and restored by the decoder's
codegen replace chain.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_END = "▁"  # end-of-word marker (SentencePiece-style visible space)
_ESC = "\uE000"  # private-use escape introducer for literal markers
_ESC_ESC = _ESC + "E"  # literal U+E000 in input text
_ESC_END = _ESC + "U"  # literal U+2581 in input text


def _escape_text(txt: str) -> str:
    """Protect literal marker/escape chars before tokenization.

    Escape the escape char FIRST so the two rewrites cannot interact;
    the decoder's replace chain inverts them in the opposite order."""
    return txt.replace(_ESC, _ESC_ESC).replace(_END, _ESC_END)


def _escape_col(col):
    """Spark-side mirror of :func:`_escape_text` (codegen replaces)."""
    return F.replace(
        F.replace(col, F.lit(_ESC), F.lit(_ESC_ESC)),
        F.lit(_END),
        F.lit(_ESC_END),
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct word with its corpus frequency — the single
    shuffle of BPE training.  Marker/escape chars are escaped here so
    training sees the exact symbol streams encoding will see."""
    return (
        docs.select(
            F.explode(
                F.split(_escape_col(F.col(text_col)), " +")
            ).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 2,
    max_vocab: int = 500_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    The driver collect is capped by construction: words below
    ``min_freq`` are filtered in the aggregation and the survivors are
    truncated to the ``max_vocab`` most frequent (ties broken by word
    order, so the collected table is deterministic across
    partitionings).  The merge loop uses the classic incremental
    update: only words containing the merged pair are touched, and
    pair counts are delta-adjusted via a pair->words occurrence index.
    """
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        wc = wc.filter(F.col("freq") >= min_freq)
    rows = (
        wc.orderBy(F.desc("freq"), F.asc("word")).limit(int(max_vocab)).collect()
    )
    words: list[tuple[list[str], int]] = [
        (list(r["word"]) + [_END], int(r["freq"])) for r in rows
    ]
    pair_counts: Counter = Counter()
    occurs: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, freq) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            occurs.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        if best_n < 2:
            break
        best = min(p for p, c in pair_counts.items() if c == best_n)
        merges.append(best)
        fused = best[0] + best[1]
        for wi in sorted(occurs.get(best, ())):
            syms, freq = words[wi]
            old_pairs = list(zip(syms, syms[1:]))
            new_syms: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    new_syms.append(fused)
                    i += 2
                else:
                    new_syms.append(syms[i])
                    i += 1
            words[wi] = (new_syms, freq)
            new_pairs = list(zip(new_syms, new_syms[1:]))
            for p in old_pairs:
                pair_counts[p] -= freq
            for p in set(old_pairs):
                s = occurs.get(p)
                if s is not None:
                    s.discard(wi)
                if pair_counts.get(p, 0) <= 0:
                    pair_counts.pop(p, None)
                    occurs.pop(p, None)
            for p in new_pairs:
                pair_counts[p] += freq
            for p in set(new_pairs):
                occurs.setdefault(p, set()).add(wi)
    return merges


def _apply_bpe(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word) + [_END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_docs(
    docs: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, tokens array<string>, n_tokens, n_words).  Merge
    ranks broadcast once; per-word results memoized per batch (Zipf
    makes the cache hit rate high).  Literal marker/escape chars in
    the input are escaped so decode restores them exactly."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ntok, nw = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                escaped = _escape_text(txt or "")
                words = [w for w in escaped.split(" ") if w]
                out: list[str] = []
                for w in words:
                    t = cache.get(w)
                    if t is None:
                        t = _apply_bpe(w, ranks)
                        cache[w] = t
                    out.extend(t)
                ids.append(int(did))
                toks.append(out)
                ntok.append(len(out))
                nw.append(len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "tokens": toks,
                    "n_tokens": pd.array(ntok, dtype="int64"),
                    "n_words": pd.array(nw, dtype="int64"),
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        _batches,
        "doc_id LONG, tokens ARRAY<STRING>, n_tokens LONG, n_words LONG",
    )


def decode_tokens(encoded: DataFrame) -> DataFrame:
    """tokens -> text: concatenate, turn end-of-word markers back into
    spaces, then unescape literal marker/escape chars — pure codegen
    (no Python), proving decode needs no model state beyond the token
    strings themselves.  Unescape order is the inverse of
    :func:`_escape_text`: genuine markers become spaces first (escaped
    literals cannot collide — they were rewritten to two-char escape
    sequences), then the escape sequences restore the original chars."""
    joined = F.concat_ws("", F.col("tokens"))
    spaced = F.replace(joined, F.lit(_END), F.lit(" "))
    unesc = F.replace(
        F.replace(spaced, F.lit(_ESC_END), F.lit(_END)),
        F.lit(_ESC_ESC),
        F.lit(_ESC),
    )
    return encoded.select(
        "doc_id",
        F.regexp_replace(unesc, " $", "").alias("decoded_text"),
        "n_tokens",
        "n_words",
    )
