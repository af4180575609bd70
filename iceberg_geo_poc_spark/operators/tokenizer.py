"""Byte-pair-encoding tokenizer — train + encode + decode, Spark-first.

Token counting for corpus budgeting already exists (operators/text.py);
this module adds the real thing: BPE TRAINING over a corpus and exact
ENCODE/DECODE with the learned merges — the tokenizer lifecycle every
LM data pipeline runs before packing sequences.

Scale shape (the part that must survive 100 TB):
- The DISTRIBUTED stage is word counting: one explode + partial-agg
  groupBy, shuffling one row per DISTINCT word (Zipf-bounded, millions
  of rows at web scale — not corpus-sized).  This mirrors how
  production BPE trainers work: corpus-level work happens once, the
  merge loop then operates on the aggregated word-frequency table.
- The merge LOOP is driver-side over that bounded table, with the
  classic pair-count update (only words containing the merged pair are
  touched).  Determinism: ties broken by lexicographic pair order.
- ENCODING is a broadcast of the merge ranks + one pandas batch pass
  per partition (apply merges lowest-rank-first per word); decoding is
  pure string concat — both embarrassingly parallel.

The driver-query contract: decode(encode(text)) == text EXACTLY (the
strongest tokenizer invariant), plus token-count sanity bounds the
oracle recomputes in SQL.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_END = "▁"  # end-of-word marker (SentencePiece-style visible space)


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct word with its corpus frequency — the single
    shuffle of BPE training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " +")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    docs: DataFrame, n_merges: int = 200, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    The word-frequency table is collected to the driver (bounded by
    distinct-word count; at true web scale cap it with a frequency
    floor) and merged with the textbook algorithm: repeatedly fuse the
    most frequent adjacent symbol pair, ties broken lexicographically
    so training is deterministic across partitionings."""
    rows = word_counts(docs, text_col).collect()
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (_END,): int(r["freq"]) for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: Counter = Counter()
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += freq
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == best_n)
        if best_n < 2:
            break
        merges.append(best)
        fused = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(fused)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
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
    makes the cache hit rate high)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ntok, nw = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                words = [w for w in (txt or "").split(" ") if w]
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
    """tokens -> text: concatenate and turn end-of-word markers back
    into spaces — pure codegen (no Python), proving decode needs no
    model state beyond the token strings themselves."""
    return encoded.select(
        "doc_id",
        F.rtrim(
            F.translate(F.concat_ws("", F.col("tokens")), _END, " ")
        ).alias("decoded_text"),
        "n_tokens",
        "n_words",
    )
