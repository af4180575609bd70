"""WordPiece tokenizer lifecycle — the BERT-family member of the
tokenizer surface (train / encode / decode), Spark-first.

Completes the subword-tokenizer family next to BPE
(operators/tokenizer.py, GPT-family merges) and unigram-LM
(operators/unigram.py, SentencePiece family).  Reference parity note:
the reference repo ships no tokenizers (it is a table format); this is
north-star LLM-pipeline surface per SURVEY.md §2.12.

Design (all three phases mirror the siblings' scale posture):

- TRAINING: one distributed word-count shuffle (the same
  ``word_counts`` aggregation BPE uses — partial-agg, bounded by a
  ``min_freq`` floor and a deterministic ``ORDER BY freq DESC, word
  LIMIT max_vocab`` pushed into the plan, so the driver collect is
  capped by construction).  The merge loop is the published WordPiece
  objective: fuse the pair maximizing ``freq(ab) / (freq(a)·freq(b))``
  (likelihood gain of the fused piece over its parts), incremental
  pair-count updates via a pair→words occurrence index — only words
  containing the fused pair are touched per iteration.
- ENCODING: greedy longest-match-first against the learned vocab
  (continuations carry the ``##`` prefix).  Broadcast vocab set +
  memoized per-batch ``mapInPandas`` — zero shuffle, Zipf makes the
  word cache hit rate high.  Every single character (and its ``##``
  form) is seeded into the vocab, so no input ever falls to ``[UNK]``
  and the round-trip invariant is total.
- DECODING: pure codegen — continuations drop their ``##`` and
  concatenate, word starts join with spaces (``transform`` +
  ``array_join``; no Python).

Round-trip contract: ``decode(encode(x)) == x`` exactly after
whitespace normalization (runs of spaces collapse — same documented
precondition as the BPE sibling).  Literal ``#`` characters in input
text are escaped to a private-use sequence during encoding and
restored by decode, so the ``##`` continuation marker is unambiguous
even on corpora that contain hashes.

Compression contract: WordPiece's untrained baseline is exactly one
token per character, so the honest claim is CORPUS-level — total
tokens strictly below total (escaped) characters — rather than the
per-document slack BPE's end-of-word markers provide.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_CONT = "##"
_ESC = ""  # private-use escape introducer (distinct from BPE's E000)
_ESC_ESC = _ESC + "E"  # literal U+E001 in input text
_ESC_HASH = _ESC + "H"  # literal '#' in input text


def _escape_text(txt: str) -> str:
    """Protect literal '#' (and the escape char itself) before
    tokenization; escape the escape char FIRST so the rewrites cannot
    interact."""
    return txt.replace(_ESC, _ESC_ESC).replace("#", _ESC_HASH)


def _escape_col(col):
    """Spark-side mirror of :func:`_escape_text` (codegen replaces)."""
    return F.replace(
        F.replace(col, F.lit(_ESC), F.lit(_ESC_ESC)),
        F.lit("#"),
        F.lit(_ESC_HASH),
    )


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One row per distinct word with its corpus frequency — the single
    shuffle of WordPiece training.  '#' is escaped HERE so training
    sees the exact symbol streams encoding will see (and the ``##``
    continuation prefix stays unambiguous)."""
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


def _word_pieces(word: str) -> list[str]:
    """Initial symbol sequence: first char plain, rest ##-prefixed."""
    return [word[0]] + [_CONT + c for c in word[1:]]


def _fuse(a: str, b: str) -> str:
    """Fused vocab entry: b sheds its continuation prefix."""
    return a + (b[len(_CONT):] if b.startswith(_CONT) else b)


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_freq: int = 2,
    max_vocab: int = 500_000,
) -> list[str]:
    """Learn a WordPiece vocabulary; returns the learned multi-char
    pieces in merge order (single chars are implicit — encoding seeds
    them from the input itself, so coverage is total by construction).

    Pair score = freq(pair) / (freq(first)·freq(second)) — the
    WordPiece likelihood objective, which prefers fusing pieces that
    co-occur more than their unigram frequencies predict (unlike BPE's
    raw-count objective).  Ties break on lexicographic pair order so
    training is deterministic across partitionings.
    """
    wc = word_counts(docs, text_col)
    if min_freq > 1:
        wc = wc.filter(F.col("freq") >= min_freq)
    rows = (
        wc.orderBy(F.desc("freq"), F.asc("word")).limit(int(max_vocab)).collect()
    )
    words: list[tuple[list[str], int]] = [
        (_word_pieces(r["word"]), int(r["freq"])) for r in rows if r["word"]
    ]
    pair_counts: Counter = Counter()
    sym_counts: Counter = Counter()
    occurs: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, freq) in enumerate(words):
        for s in syms:
            sym_counts[s] += freq
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freq
            occurs.setdefault(p, set()).add(wi)

    merges: list[str] = []
    for _ in range(n_merges):
        best = None
        best_score = 0.0
        for p, c in pair_counts.items():
            if c < 2:
                continue
            score = c / (sym_counts[p[0]] * sym_counts[p[1]])
            if score > best_score or (score == best_score and (best is None or p < best)):
                best = p
                best_score = score
        if best is None:
            break
        fused = _fuse(best[0], best[1])
        merges.append(fused)
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
                    sym_counts[best[0]] -= freq
                    sym_counts[best[1]] -= freq
                    sym_counts[fused] += freq
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


def _encode_word(word: str, vocab: frozenset[str], max_len: int) -> list[str]:
    """Greedy longest-match-first; single chars always match (seeded
    from the word itself), so this is total — no [UNK] path."""
    out: list[str] = []
    i = 0
    n = len(word)
    while i < n:
        prefix = "" if i == 0 else _CONT
        j = min(n, i + max_len)
        while j > i + 1:
            cand = prefix + word[i:j]
            if cand in vocab:
                break
            j -= 1
        if j == i + 1:
            out.append(prefix + word[i])
        else:
            out.append(prefix + word[i:j])
        i = j
    return out


def encode_docs(
    docs: DataFrame, pieces: list[str], text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, tokens array<string>, n_tokens, n_words).  Learned
    pieces broadcast in the closure; per-word results memoized per
    batch.  Coverage is total because every single character of the
    input (plain and ##-prefixed) is in-vocab by definition."""
    vocab = frozenset(pieces)
    max_len = max((len(p) for p in pieces), default=1)

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
                        t = _encode_word(w, vocab, max_len)
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


def decode_tokens(encoded: DataFrame) -> DataFrame:
    """tokens -> text, pure codegen: continuations shed ``##`` and
    concatenate; word-start pieces get a space prepended; then the
    leading space drops and literal-'#' escapes restore.  Unescape
    order inverts :func:`_escape_text`."""
    rejoined = F.array_join(
        F.transform(
            F.col("tokens"),
            lambda t: F.when(
                t.startswith(_CONT), F.substring(t, len(_CONT) + 1, 1 << 30)
            ).otherwise(F.concat(F.lit(" "), t)),
        ),
        "",
    )
    trimmed = F.regexp_replace(rejoined, "^ ", "")
    unesc = F.replace(
        F.replace(trimmed, F.lit(_ESC_HASH), F.lit("#")),
        F.lit(_ESC_ESC),
        F.lit(_ESC),
    )
    return encoded.select(
        "doc_id",
        unesc.alias("decoded_text"),
        "n_tokens",
        "n_words",
    )
