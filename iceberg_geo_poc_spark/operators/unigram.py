"""Unigram-LM tokenizer (SentencePiece-style) — train + encode + decode.

The second of the two tokenizer families every LM pipeline uses
(operators/tokenizer.py is the BPE one): instead of greedy merges, a
UNIGRAM LANGUAGE MODEL over subword pieces is fit with EM (Kudo 2018,
"Subword Regularization"), pieces are pruned to a target vocabulary,
and encoding picks each word's maximum-likelihood segmentation by
Viterbi.

Scale shape (same contract as train_bpe):
- the DISTRIBUTED stage is word counting — one explode + partial-agg
  groupBy (tokenizer.word_counts, shared); the driver collect is capped
  by ``min_freq`` + ``ORDER BY freq DESC LIMIT max_vocab`` pushed into
  the plan, so a 100 TB corpus collects a bounded frequency table.
- seed enumeration, EM, and pruning run driver-side over that bounded
  table (SentencePiece itself trains on a bounded sample for the same
  reason); per-iteration cost is O(words x len x max_piece_len).
- ENCODING is a broadcast of the piece log-probs + memoized Viterbi in
  ``mapInPandas`` batches; DECODING reuses the pure-codegen concat
  chain (tokenizer.decode_tokens) unchanged — token strings carry all
  the state.

Coverage invariant: every single character seen in training stays in
the vocabulary (never pruned), and encoding falls back to per-character
tokens for unseen characters — so ``decode(encode(x))`` equals
whitespace-normalized x for ARBITRARY text, the same round-trip
contract (and escape scheme) as the BPE module.
"""

from __future__ import annotations

import math
from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from iceberg_geo_poc_spark.operators.tokenizer import (
    _END,
    _escape_text,
    word_counts,
)

_UNSEEN_LOGP = -100.0  # floor for characters never seen in training


def _seed_vocab(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Candidate pieces: all substrings up to ``max_piece_len`` of the
    (end-marked) words, scored by frequency-weighted occurrence count;
    the top ``seed_size`` multi-char pieces plus EVERY single char.
    Initial log-probs come from the normalized counts."""
    counts: Counter = Counter()
    chars: Counter = Counter()
    for s, freq in words:
        n = len(s)
        for i in range(n):
            chars[s[i]] += freq
            for L in range(2, min(max_piece_len, n - i) + 1):
                counts[s[i : i + L]] += freq
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    vocab = dict(top)
    for c, f in chars.items():
        vocab[c] = vocab.get(c, 0) + f
    total = sum(vocab.values())
    return {p: math.log(f / total) for p, f in vocab.items()}


def _expected_counts(
    words: list[tuple[str, int]], logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """E-step: forward-backward over each word's segmentation lattice,
    accumulating frequency-weighted expected piece counts (log-domain,
    so 30-char words cannot underflow)."""
    exp: dict[str, float] = {}
    for s, freq in words:
        n = len(s)
        # matches[i] = [(j, piece, lp)] for pieces spanning s[i:j]
        matches: list[list[tuple[int, str, float]]] = []
        for i in range(n):
            row = []
            for L in range(1, min(max_piece_len, n - i) + 1):
                p = s[i : i + L]
                lp = logp.get(p)
                if lp is not None:
                    row.append((i + L, p, lp))
            matches.append(row)
        la = [-math.inf] * (n + 1)
        la[0] = 0.0
        for i in range(n):
            if la[i] == -math.inf:
                continue
            for j, _p, lp in matches[i]:
                v = la[i] + lp
                la[j] = v if la[j] == -math.inf else _logadd(la[j], v)
        if la[n] == -math.inf:  # pragma: no cover - coverage invariant
            continue
        lb = [-math.inf] * (n + 1)
        lb[n] = 0.0
        for i in range(n - 1, -1, -1):
            for j, _p, lp in matches[i]:
                if lb[j] == -math.inf:
                    continue
                v = lp + lb[j]
                lb[i] = v if lb[i] == -math.inf else _logadd(lb[i], v)
        z = la[n]
        for i in range(n):
            if la[i] == -math.inf:
                continue
            for j, p, lp in matches[i]:
                if lb[j] == -math.inf:
                    continue
                exp[p] = exp.get(p, 0.0) + freq * math.exp(la[i] + lp + lb[j] - z)
    return exp


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    min_freq: int = 2,
    max_vocab: int = 500_000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    seed_factor: int = 4,
) -> list[tuple[str, float]]:
    """Fit the unigram LM: seed with frequent substrings, then
    alternate EM refits with pruning of the lowest-expected-count
    multi-char pieces until ``vocab_size`` pieces remain (single chars
    are never pruned — the coverage invariant).  Deterministic: all
    orderings tie-break lexicographically.  Returns
    ``[(piece, log_prob)]`` sorted by piece."""
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        wc = wc.filter(wc.freq >= min_freq)
    import pyspark.sql.functions as F

    rows = (
        wc.orderBy(F.desc("freq"), F.asc("word")).limit(int(max_vocab)).collect()
    )
    words = [(r["word"] + _END, int(r["freq"])) for r in rows]
    if not words:
        return []
    logp = _seed_vocab(words, vocab_size * seed_factor, max_piece_len)
    chars = {p for p in logp if len(p) == 1}
    while True:
        for _ in range(em_iters):
            exp = _expected_counts(words, logp, max_piece_len)
            # pieces with zero expectation vanish unless they are chars
            kept = {
                p: c for p, c in exp.items() if c > 0 or len(p) == 1
            }
            for c in chars:  # chars always survive with a floor count
                kept.setdefault(c, 1e-9)
                if kept[c] <= 0:
                    kept[c] = 1e-9
            total = sum(kept.values())
            logp = {p: math.log(c / total) for p, c in kept.items()}
        multi = [p for p in logp if len(p) > 1]
        if len(logp) <= vocab_size or not multi:
            break
        exp = _expected_counts(words, logp, max_piece_len)
        n_drop = max(
            1, min(len(multi), int(len(multi) * prune_frac), len(logp) - vocab_size)
        )
        victims = sorted(multi, key=lambda p: (exp.get(p, 0.0), p))[:n_drop]
        for p in victims:
            del logp[p]
    return sorted(logp.items())


def _viterbi(word: str, logp: dict[str, float], max_piece_len: int) -> list[str]:
    """Max-likelihood segmentation; ties prefer the longer piece then
    lexicographic order.  Unseen characters become single-char tokens
    at a floor probability (round-trip still exact)."""
    n = len(word)
    best = [-math.inf] * (n + 1)
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] == -math.inf:
            continue
        found = False
        for L in range(1, min(max_piece_len, n - i) + 1):
            p = word[i : i + L]
            lp = logp.get(p)
            if lp is None:
                continue
            found = found or L == 1
            v = best[i] + lp
            j = i + L
            if v > best[j] or (
                v == best[j]
                and back[j] is not None
                and (len(p), p) > (len(back[j][1]), back[j][1])
            ):
                best[j], back[j] = v, (i, p)
        if not found:  # unseen char fallback
            p = word[i]
            v = best[i] + _UNSEEN_LOGP
            if v > best[i + 1]:
                best[i + 1], back[i + 1] = v, (i, p)
    out: list[str] = []
    j = n
    while j > 0:
        i, p = back[j]
        out.append(p)
        j = i
    out.reverse()
    return out


def encode_unigram_docs(
    docs: DataFrame, vocab: list[tuple[str, float]], text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, tokens array<string>, n_tokens, n_words): Viterbi
    segmentation per word with the broadcast piece log-probs, memoized
    per batch — the same schema as tokenizer.encode_docs, so
    tokenizer.decode_tokens decodes either family unchanged."""
    logp = dict(vocab)
    max_len = max((len(p) for p in logp), default=1)

    def _batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            ids, toks, ntok, nw = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf[text_col]):
                escaped = _escape_text(txt or "")
                ws = [w for w in escaped.split(" ") if w]
                out: list[str] = []
                for w in ws:
                    t = cache.get(w)
                    if t is None:
                        t = _viterbi(w + _END, logp, max_len)
                        cache[w] = t
                    out.extend(t)
                ids.append(int(did))
                toks.append(out)
                ntok.append(len(out))
                nw.append(len(ws))
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
