"""Deduplication operators for 100 TB document corpora (SURVEY.md §2.12).

Five variants, all pure JVM-side DataFrame compositions (no Python in
the hot path — higher-order array functions stay inside codegen):

- exact         : content-hash groupBy (one shuffle on a 128-bit hash)
- n-gram jaccard: inverted-index self-join on shingles (the classic
                  "explode + equi-join" plan — shuffle keys are shingle
                  strings, so Spark's AQE skew handling covers hot
                  shingles; no O(n^2) pair enumeration ever happens)
- MinHash + LSH : signature -> banded bucket join -> exact-jaccard verify.
                  The scale path: candidate generation touches only docs
                  sharing a band bucket; verification joins shingle sets
                  for candidates only.
- SimHash       : 32-bit sign-sum fingerprint; candidates share a 16-bit
                  half (Charikar two-block pigeonhole), verified by
                  hamming distance.
- embedding     : label-blocked cosine pairs (see similarity.py for the
                  general ANN machinery).

Scale notes: every join here is an equi-join on a derived key (shingle,
band bucket, simhash half, label), so at 1000 executors each variant is
one or two hash-partitioned shuffles; nothing is broadcast except probe
sets, and nothing collects to the driver.  Hashes are engine-portable
(hashing.py) so the DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.storagelevel import StorageLevel

from iceberg_geo_poc_spark.operators.hashing import (
    MERSENNE_P,
    minhash_coeffs,
    spark_hash60,
)

NUM_PERM = 64
BANDS = 16
ROWS_PER_BAND = 4  # BANDS * ROWS_PER_BAND == NUM_PERM


def with_words(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokenization as an array column (stays in codegen)."""
    return df.withColumn("words", F.split(F.col(text_col), " "))


def with_shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document (0-based Spark array indexing).

    Guarded for docs shorter than n words: Spark's sequence(0, negative)
    counts DOWN, so the short case must return an empty array explicitly.
    """
    parts = ", ".join(f"words[i + {k}]" for k in range(n))
    return df.withColumn(
        "shingles",
        F.expr(
            f"CASE WHEN size(words) < {n} THEN array() "
            f"ELSE array_distinct(transform(sequence(0, size(words) - {n}),"
            f" i -> concat_ws(' ', {parts}))) END"
        ),
    )


def exact_dedup_stats(docs: DataFrame) -> DataFrame:
    """Per-source exact-duplicate stats via md5 content hash.

    At scale this is the cheapest dedup: one partial-aggregated shuffle
    on the hash, never on the document text itself.
    """
    hashed = docs.select("source", F.md5("text").alias("content_hash"))
    per_hash = hashed.groupBy("source", "content_hash").agg(
        F.count("*").alias("copies")
    )
    return (
        per_hash.groupBy("source")
        .agg(
            F.sum("copies").alias("n_docs"),
            F.count("*").alias("n_distinct"),
            (F.sum("copies") - F.count("*")).alias("n_dup_docs"),
        )
        .orderBy("source")
    )


def _doc_shingles(docs: DataFrame) -> DataFrame:
    return with_shingles(with_words(docs)).select(
        "doc_id", "shingles", F.size("shingles").alias("n_sh")
    )


# logical-plan node names that mean "not a plain narrow scan": for such
# inputs the scan-split estimate below would not describe the head's
# parallelism, so they keep the unconditional spread (status quo)
_NON_SCAN_NODES = (
    "Join", "Aggregate", "Window", "Sort", "Repartition", "Rebalance",
    "Deduplicate", "Distinct", "Generate", "Union", "MapIn", "FlatMap",
    "CoGroup", "Limit",
)


def _spread_for_head(docs: DataFrame, key_col: str = "doc_id") -> DataFrame:
    """Spread a possibly-underpartitioned input so the heavy pre-exchange
    head (shingle/md5/signature kernels, gram explode) runs on every
    core — the guide's §2.5 deterministic ``pmod(xxhash64)`` recipe.

    GATED on the input's scan parallelism (VERDICT r15 #2): a real
    multi-file table at scale already arrives in thousands of splits,
    and an unconditional repartition would shuffle the entire raw text
    for nothing — one full linear pass over a 100 TB corpus.  The skip
    condition estimates the scan's partition count from the input
    files' sizes with Spark's own split formula (FilePartition:
    ``maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    (bytes + files*openCost) / minPartitionNum))``, then size-packed),
    because probing ``rdd.getNumPartitions()`` directly would pay a
    full physical-planning pass per call (~50 ms measured) and, under
    AQE, would eagerly materialize stages for exchange-bearing inputs.
    ``inputFiles()`` + ``os.stat`` need only plan analysis (~0 ms
    extra, measured).  Non-scan plans, empty file lists and non-local
    URIs fall back to the spread — the status-quo posture, where the
    added exchange is one linear pass.
    """
    spark = docs.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        logical = docs._jdf.queryExecution().logical().toString()
        if not any(k in logical for k in _NON_SCAN_NODES):
            files = docs.inputFiles()
            if files:
                paths = []
                for f in files:
                    if f.startswith("file:"):
                        # file:///p, file:/p -> /p
                        paths.append("/" + f.split(":", 1)[1].lstrip("/"))
                    elif f.startswith("/"):
                        paths.append(f)
                    else:  # object-store URI: cannot stat locally
                        raise ValueError(f)
                total = sum(os.stat(p).st_size for p in paths)
                conf = spark._jsparkSession.sessionState().conf()
                max_pb = int(conf.filesMaxPartitionBytes())
                open_cost = int(conf.filesOpenCostInBytes())
                padded = total + len(files) * open_cost
                max_split = min(max_pb, max(open_cost, padded // max(n, 1)))
                est_parts = -(-padded // max(max_split, 1))
                if est_parts >= n:
                    return docs
    except Exception:
        pass  # un-probeable input: fall through to the spread
    return docs.repartition(n, F.pmod(F.xxhash64(key_col), F.lit(100 * n)))


def _verified_pairs(cand: DataFrame, sh: DataFrame, threshold: float) -> DataFrame:
    """Join candidate (ia, ib) pairs back to shingle sets; exact jaccard."""
    a = sh.select(
        F.col("doc_id").alias("ia"),
        F.col("shingles").alias("sh_a"),
        F.col("n_sh").alias("na"),
    )
    b = sh.select(
        F.col("doc_id").alias("ib"),
        F.col("shingles").alias("sh_b"),
        F.col("n_sh").alias("nb"),
    )
    return (
        cand.join(a, "ia")
        .join(b, "ib")
        .withColumn("shared", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("ia", "ib", "jaccard")
    )


def _pairs_from_buckets(bucketed: DataFrame, key_cols: list[str]) -> DataFrame:
    """(ia, ib) with ia < ib for every pair of doc_ids sharing a bucket.

    One hash-partitioned shuffle (the groupBy); pair enumeration happens
    inside codegen via array transforms — versus a self-equi-join this
    removes a second shuffle of the full index plus the join build side.
    Bucket width is bounded by near-duplicate density, not corpus size
    (identical to the self-join's output-size behavior); a genuinely hot
    bucket (e.g. a degenerate empty-text key) should be filtered
    upstream, exactly as with the join formulation.
    """
    buckets = (
        bucketed.groupBy(*key_cols)
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.array_sort("ids"))
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS ia, y AS ib))))"
                )
            ).alias("p")
        )
        .select("p.ia", "p.ib")
        .distinct()
    )


def duplicate_passages(docs: DataFrame, k: int = 8, min_docs: int = 2) -> DataFrame:
    """Exact-substring (passage-level) dedup: word ``k``-grams occurring
    in at least ``min_docs`` DISTINCT documents — the passage analogue
    of suffix-array training-data dedup ("Deduplicating Training Data
    Makes Language Models Better", Lee et al. 2022), expressed as pure
    codegen: window-slice the token array, explode, one partial-agg
    groupBy.

    Doc-level dedup (ngram_jaccard_pairs/minhash) misses boilerplate
    passages shared by otherwise-distinct documents; this finds them.

    Scale shape: the single shuffle is the groupBy on the gram; at
    100 TB the gram key would be ``xxhash64(gram)`` (8 bytes instead of
    the passage text) with the text recovered from one exemplar via a
    first() aggregate — the string key here keeps the DuckDB oracle
    byte-comparable.  Map-side partial aggregation bounds the shuffle by
    the number of DISTINCT grams per partition, not token count.
    """
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {k} THEN "
                f"transform(sequence(1, size(w) - {k - 1}), "
                f"i -> array_join(slice(w, i, {k}), ' ')) "
                f"ELSE array() END"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_duplicate_spans(
    docs: DataFrame, k: int = 8, hash_grams: bool = True
) -> DataFrame:
    """ExactSubstr span REMOVAL (Lee et al. 2022 §4.1, the suffix-array
    dedup used for GPT-3/PaLM-class corpora): every duplicated run of
    ``>= k`` tokens keeps only its FIRST occurrence corpus-wide
    (ordered by (doc_id, position)); every other occurrence is excised
    from the text.  ``duplicate_passages`` *finds* shared passages;
    this produces the cleaned corpus.

    Spark shape (the groupBy-join equivalent of the paper's suffix
    array — the idiomatic distributed form):

    1. one codegen pass slides a ``k``-token window per doc and
       explodes (doc_id, pos, key);
    2. ``min_by``-style first-occurrence election: one partial-agg
       groupBy on the gram key (NO collect_list — a boilerplate gram
       occurring 10^6 times costs a counter, not a buffer);
    3. occurrences != first re-join on the key (co-partitioned with the
       agg; AQE coalesces) -> duplicate window starts;
    4. per doc: sort the start positions, MERGE overlapping [pos,
       pos+k-1] windows into maximal spans with one ``aggregate`` HOF
       (codegen, no UDF), excise by ``array_except`` over positions
       (order-preserving), rebuild the text.

    ``hash_grams=True`` keys the election on ``xxhash64(gram)`` —
    8-byte shuffle rows, the 100 TB form (a 2^-64-per-pair collision
    risks dropping a non-duplicated span; acceptable for corpus
    hygiene).  ``hash_grams=False`` keys on the gram text itself —
    byte-exact, replayable by the DuckDB oracle; both paths elect the
    same spans whenever no collision occurs (asserted in tests).

    Returns (doc_id, n_dup_spans, n_dropped_tokens, clean_text);
    documents shorter than ``k`` tokens pass through unchanged.

    The documents are spread across the cluster first (deterministic
    pmod(xxhash64) hash, the guide's §2.5 recipe): the gram head
    (split + window slide + per-gram hash/join-key build) is real CPU
    that runs BEFORE the election window's exchange, so a single-file
    input would execute it serially in one task.  Interleaved A/B at
    sf0.1: med 1.19 → 0.96 s, identical output.  (An earlier rejection
    of this spread predates the one-window election rewrite, whose
    head is proportionally heavier.)  Skipped when the input is already
    spread (see ``_spread_for_head``).
    """
    docs = _spread_for_head(docs)
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    key_expr = (
        f"xxhash64(array_join(slice(w, i, {k}), ' '))"
        if hash_grams
        else f"array_join(slice(w, i, {k}), ' ')"
    )
    grams = w.select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= {k} THEN "
                f"transform(sequence(1, size(w) - {k - 1}), "
                f"i -> struct(i - 1 AS pos, {key_expr} AS key)) "
                f"ELSE array() END"
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.key")
    # non-first occurrences per gram, elected with ONE window over the
    # gram key: row_number ordered by (doc_id, pos) — corpus order — is
    # >= 2 exactly on the occurrences the old groupBy+join form kept
    # (n_occ > 1 and not the min struct).  The window costs a per-
    # partition sort, but replaces the previous TWO full-stream
    # exchanges (partial-agg rows are ~as wide as raw grams when grams
    # are mostly unique, which a real corpus's are) plus a full-stream
    # equi-join plus a SECOND explode pass over the corpus with a
    # single exchange of the gram stream (guide §2.4: remove shuffles
    # outright).  Per-key state stays a sort cursor, never a buffer —
    # a 10^6-occurrence boilerplate gram still streams.
    w_key = Window.partitionBy("key").orderBy("doc_id", "pos")
    dups = (
        grams.withColumn("rn", F.row_number().over(w_key))
        .filter(F.col("rn") >= 2)
        .select("doc_id", "pos")
    )
    # per-doc maximal spans: sorted window starts -> one aggregate() HOF
    # merges overlap/adjacency ([s, s+k-1] windows; a start <= last_end+1
    # extends the open span) — pure codegen, then position excision
    spans = dups.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("pos")).alias("starts")
    )
    merged = (
        f"aggregate(starts, array(struct(element_at(starts, 1) AS s, "
        f"element_at(starts, 1) + {k - 1} AS e)), "
        f"(acc, p) -> CASE WHEN p <= element_at(acc, -1).e + 1 THEN "
        f"concat(slice(acc, 1, size(acc) - 1), "
        f"array(struct(element_at(acc, -1).s AS s, "
        f"greatest(element_at(acc, -1).e, p + {k - 1}) AS e))) "
        f"ELSE concat(acc, array(struct(p AS s, p + {k - 1} AS e))) END)"
    )
    out = (
        w.join(spans, "doc_id", "left")
        .withColumn(
            "spans",
            F.expr(
                f"CASE WHEN starts IS NULL OR size(starts) = 0 THEN "
                f"CAST(array() AS array<struct<s:INT,e:INT>>) "
                f"ELSE {merged} END"
            ),
        )
        .withColumn(
            "drop_pos",
            F.expr("flatten(transform(spans, sp -> sequence(sp.s, sp.e)))"),
        )
        .select(
            "doc_id",
            F.size("spans").alias("n_dup_spans"),
            F.size("drop_pos").alias("n_dropped_tokens"),
            F.expr(
                "array_join(transform("
                "array_except(sequence(0, size(w) - 1), drop_pos), "
                "i -> element_at(w, i + 1)), ' ')"
            ).alias("clean_text"),
        )
    )
    return out


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Near-dup pairs by exact n-gram jaccard, via a PREFIX-FILTERED
    inverted index (Bayardo et al. "Scaling Up All Pairs Similarity
    Search" / SSJoin prefix filtering).

    For jaccard(A, B) >= t, |A ∩ B| >= ceil(t·|A|); with both shingle
    sets sorted by ONE global total order (here: the xxhash64 value),
    the first ``|A| - ceil(t·|A|) + 1 = floor((1-t)·|A|) + 1`` shingles
    of A must intersect B's same-sized prefix.  Indexing ONLY each
    doc's prefix is therefore EXACT — no qualifying pair is missed —
    while bounding the classic hot-bucket blowup: a boilerplate shingle
    shared by 10^6 docs only pairs the docs whose (1-t)-prefix it
    reaches in hash order, instead of enumerating ~10^12 pairs from one
    full-index bucket.  Candidates then verify with an exact set
    intersection (the same ``_verified_pairs`` kernel MinHash-LSH
    uses), so the output is identical to the unfiltered index.
    """
    sh = _doc_shingles(docs).persist()
    # prefix length per doc: floor((1-t)*n)+1, over hash-sorted shingles
    pref = sh.select(
        "doc_id",
        F.explode(
            F.expr(
                "slice(array_sort(transform(shingles, s -> xxhash64(s))),"
                f" 1, CAST(floor((1.0 - {threshold}) * size(shingles)) AS INT)"
                " + 1)"
            )
        ).alias("shingle_h"),
    )
    buckets = (
        pref.groupBy("shingle_h")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.array_sort("ids"))
    )
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS ia, y AS ib))))"
                )
            ).alias("p")
        )
        .select("p.ia", "p.ib")
        .distinct()
    )
    # materialize the (small) verified output eagerly so the shingle
    # cache can be released — repeated calls must not accumulate cached
    # blocks for the session lifetime
    try:
        return _verified_pairs(cand, sh, threshold).localCheckpoint()
    finally:
        sh.unpersist()


def minhash_signatures(sh: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """64-permutation MinHash signature as an array<bigint> column.

    Shingle hashes are reduced mod p in codegen (JVM md5), then the
    num_perm permutation minima compute PERMUTATION-MAJOR over one flat
    concatenated shingle array: per permutation, one vectorized
    ``(flat * a + b) % p`` pass plus a ``np.minimum.reduceat`` segment
    fold over the per-doc boundaries.  This removes the per-document
    Python loop the original doc-major kernel paid (5k iterations per
    10k-row batch) while touching the same bytes; measured on the real
    sf0.1 distribution (5k docs, 8-98 shingles) it is ~20% faster than
    the doc-major grid, and the two earlier-rejected layouts (flat 2-D
    grid: 7-14x worse; 3-D padded buckets: 1.8x worse) stay rejected —
    numbers in OPTIMIZATION_r16.md.  Values are IDENTICAL to the
    arithmetic the DuckDB-replayable contract states: p = 2^31 - 1
    keeps every product a*x + b under 2^62, exactly representable in
    uint64, so no wraparound enters (bit-equality with the naive grid
    is pinned by tests/test_dedup_minhash_kernel.py).
    Zero shuffles either way."""
    from pyspark.sql.functions import pandas_udf

    coeffs = minhash_coeffs(num_perm)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.uint64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.uint64)
    p = np.uint64(MERSENNE_P)

    @pandas_udf("array<long>")
    def _sig(sh_hash: pd.Series) -> pd.Series:
        n_docs = len(sh_hash)
        lens = np.fromiter(
            (len(a) for a in sh_hash), dtype=np.int64, count=n_docs
        )
        empty = np.zeros(0, dtype=np.int64)
        out: list = [empty] * n_docs
        nz = np.flatnonzero(lens > 0)
        if len(nz) == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(sh_hash.iloc[i], dtype=np.uint64) for i in nz]
        )
        starts = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(lens[nz][:-1], out=starts[1:])
        sig = np.empty((len(nz), num_perm), dtype=np.int64)
        for j in range(num_perm):
            vals = (flat * a_vec[j] + b_vec[j]) % p
            sig[:, j] = np.minimum.reduceat(vals, starts)
        for k, i in enumerate(nz):
            out[i] = sig[k]
        return pd.Series(out)

    hashed = sh.withColumn(
        "sh_hash",
        F.expr(
            "transform(shingles, s -> "
            + spark_hash60("s")
            + f" % CAST({MERSENNE_P} AS BIGINT))"
        ),
    )
    return hashed.select(
        "doc_id", "shingles", "n_sh", _sig(F.col("sh_hash")).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame) -> DataFrame:
    """Banded-LSH candidate pairs: docs agreeing on >= 1 of 16 bands.

    The band key is ONE xxhash64 long over (band index, 4 signature
    values) — equal bands always collide, so no candidate is lost, and
    a spurious 64-bit collision (p ~ n^2 / 2^65) can only ADD a
    candidate that the exact-jaccard verification then gates exactly
    like any other below-threshold candidate.  Versus the previous
    "v0,v1,v2,v3" string keys this shuffles 8 bytes per band instead of
    ~40-80 and group-compares longs instead of strings.  The groupBy on
    the band hash is the only shuffle, and bucket sizes are bounded by
    actual near-duplicate density, not corpus size.
    """
    band_cols = [
        F.xxhash64(
            F.lit(j),
            *[F.col("sig").getItem(j * ROWS_PER_BAND + r) for r in range(ROWS_PER_BAND)],
        )
        for j in range(BANDS)
    ]
    bands = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band_key")
    )
    return _pairs_from_buckets(bands, ["band_key"])


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-jaccard verified.

    At the default (64 perms, 16 bands x 4) a pair at jaccard 0.9 is
    missed with probability (1 - 0.9^4)^16 ~ 3e-8, so above-threshold
    output equals the exact-jaccard answer (which is what the DuckDB
    oracle computes) on any realistically-separated corpus.

    Signatures are persisted before the band self-join: the sig DF is
    referenced three times (two join sides + verification shingles) and
    the 64-permutation computation is the expensive stage — recomputing
    it per reference would triple the dominant cost at any scale.

    The docs input is spread across the cluster first (deterministic
    hash on doc_id per the guide's pmod(xxhash64) recipe): the
    shingle/md5/signature head is the pipeline's dominant CPU and runs
    BEFORE its first exchange, so a single-file input would execute it
    in one task; shuffling raw doc text once is linear I/O and far
    cheaper than serializing that kernel (interleaved A/B at sf0.1:
    min 2.27 -> 1.75 s).  Skipped when the input is already spread
    (see ``_spread_for_head``): on a well-partitioned multi-file table
    the extra exchange would shuffle the whole raw text for nothing.
    """
    docs = _spread_for_head(docs)
    sigs = minhash_signatures(_doc_shingles(docs)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        cand = lsh_candidate_pairs(sigs)
        sh = sigs.select("doc_id", "shingles", "n_sh")
        # materialize the (small) verified output eagerly so the sig
        # cache can be released — repeated calls must not accumulate
        # cached blocks for the session lifetime (same hygiene as
        # ngram_jaccard_pairs)
        return _verified_pairs(cand, sh, threshold).localCheckpoint()
    finally:
        sigs.unpersist()


SIMHASH_BITS = 32


def simhash_docs(docs: DataFrame) -> DataFrame:
    """32-bit SimHash per document over word multiset.

    Explode + groupBy with 32 ``sum((h >> b) & 1)`` partial aggregates:
    map-side combine keeps the shuffle at one row per document.
    """
    tok = with_words(docs).select(
        "doc_id", F.explode("words").alias("w")
    )
    tok = tok.withColumn("h", F.expr(spark_hash60("w")))
    ones = [
        F.sum(F.expr(f"(h >> {b}) & 1")).alias(f"ones{b}") for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(F.count("*").alias("n_words"), *ones)
    bit_terms = " + ".join(
        f"CASE WHEN 2 * ones{b} > n_words THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(SIMHASH_BITS)
    )
    return agg.select("doc_id", F.expr(bit_terms).alias("simhash"))


def simhash_pairs(docs: DataFrame, top_k: int = 20) -> DataFrame:
    """Top-k closest pairs by SimHash hamming distance.

    Candidates must agree on one of the two 16-bit halves (pigeonhole:
    hamming <= 16 guarantees a shared half for 2 blocks only when
    distance < 2, but near-dups in practice agree on a half; this IS the
    approximation the operator makes, identically in the oracle).
    """
    sh = simhash_docs(docs)
    halved = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(F.expr("simhash >> 16"), F.expr("simhash & 65535"))
        ).alias("half_idx", "half_key"),
    )
    buckets = (
        halved.groupBy("half_idx", "half_key")
        .agg(F.collect_list(F.struct("doc_id", "simhash")).alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("ids", F.array_sort("ids"))
    )
    pairs = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), y -> "
                    "struct(x.doc_id AS ia, y.doc_id AS ib, "
                    "x.simhash AS sa, y.simhash AS sb))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct()
    )
    return (
        pairs.withColumn("hamming", F.expr("bit_count(sa ^ sb)"))
        .select("ia", "ib", "hamming")
        .orderBy("hamming", "ia", "ib")
        .limit(top_k)
    )


def duplicate_cluster_representatives(pairs: DataFrame) -> DataFrame:
    """Collapse near-dup PAIRS into CLUSTERS: for every doc that has at
    least one duplicate partner, emit the cluster representative (the
    smallest doc_id reachable through the duplicate graph) — the "keep
    one copy per cluster" step of a dedup pipeline.

    Smallest-label propagation: each round every node adopts
    min(own label, neighbors' labels); converges in O(cluster diameter)
    rounds.  Near-dup clusters are shallow (pairs come from a similarity
    threshold), so 2-4 rounds suffice at any corpus size; each round is
    one edge-join + one min-aggregate, both partial-aggregable, and the
    working set is |docs in pairs|, not corpus size.  Label state is
    localCheckpoint()ed per round to keep lineage flat (the standard
    Spark iterative-algorithm posture).
    """
    edges = pairs.select(F.col("ia").alias("a"), F.col("ib").alias("b"))
    edges = (
        edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("a").alias("id")).distinct().withColumn("rep", F.col("id"))
    ).localCheckpoint()
    while True:
        nbr = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("rep").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.a, "left")
            .select(
                "id",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nbr_min"), F.col("rep"))
                ).alias("rep"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if not changed:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), "rep")


def contamination_check(
    docs: DataFrame, benchmark: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Benchmark decontamination: flag training docs whose 3-word
    shingles overlap a benchmark set above ``threshold``.

    The benchmark side is small by construction (an eval set), so its
    distinct shingle vocabulary broadcasts; the corpus side explodes
    shingles once and left-joins the broadcast — per-doc hit ratios
    fall out of one partial-aggregated groupBy.  Corpus cost is linear,
    no self-join anywhere.
    """
    bench_sh = (
        _doc_shingles(benchmark)
        .select(F.explode("shingles").alias("s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    corpus = _doc_shingles(docs).filter(F.col("n_sh") > 0)
    exploded = corpus.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    ratios = (
        exploded.join(F.broadcast(bench_sh), "s", "left")
        .groupBy("doc_id", "n_sh")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"))
        .withColumn("contamination", F.round(F.col("hits") / F.col("n_sh"), 6))
    )
    return (
        ratios.filter(F.col("contamination") >= threshold)
        .select("doc_id", "contamination")
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.3,
    scope: str = "lsh",
    n_centroids: int = 16,
    iters: int = 3,
) -> DataFrame:
    """SemDeDup-style embedding-level dedup (Abbas et al. 2023): scope
    the corpus into clusters, enumerate near-duplicate pairs ONLY
    within a cluster, and keep one representative per duplicate
    relation (smallest vec_id wins — the deterministic analogue of the
    paper's keep-one rule).

    ``scope`` picks the clustering used to bound the pair join:

    - ``"lsh"``    : fixed-hyperplane sign buckets — fully deterministic,
      so results are exactly reproducible cross-engine (the DuckDB
      oracle pins every kept/dropped row).
    - ``"kmeans"`` : Lloyd-refined centroids (similarity.kmeans_centroids),
      the paper's actual scoping — assignment is float-argmax so the
      checkable contract is recall/soundness, not exact row parity.

    Output: one row per vector — (vec_id, kept, dup_of, cosine), where
    dropped rows name the SMALLEST qualifying earlier neighbor and its
    cosine.  kept == (dup_of IS NULL); the kept set within any cluster
    is a theta-independent set by construction.

    Scale shape: one equi-join on the cluster key (pair enumeration is
    linear in cluster sizes, never all-pairs), one partial-agg min per
    dropped vector, one left join back — at 100 TB with balanced
    clusters this is exactly the SemDeDup job layout (cluster keys
    shuffle-partition the corpus; kmeans assignment is a broadcast
    argmax, see similarity.kmeans_centroids for the scoping cost).
    """
    from iceberg_geo_poc_spark.operators import similarity as S

    base = S.with_norm(emb)
    if scope == "lsh":
        base = base.withColumn(
            "cluster", F.expr(S.lsh_bucket_expr("embedding", S.NUM_PLANES))
        )
    elif scope == "kmeans":
        cents = F.broadcast(S.kmeans_centroids(emb, n_centroids, iters))
        scored = base.crossJoin(cents).withColumn(
            "ccos",
            F.expr(S.dot_expr("embedding", "cemb")) / (F.col("nrm") * F.col("cnrm")),
        )
        base = (
            scored.groupBy("vec_id", "embedding", "nrm")
            .agg(F.max(F.struct("ccos", "cid")).alias("m"))
            .select("vec_id", "embedding", "nrm", F.col("m.cid").alias("cluster"))
        )
    else:  # pragma: no cover - caller bug
        raise ValueError(f"unknown semantic_dedup scope {scope!r}")

    a = base.select(
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
        F.col("nrm").alias("na"),
        "cluster",
    )
    b = base.select(
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
        F.col("nrm").alias("nb"),
        "cluster",
    )
    pairs = (
        a.join(b, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .withColumn(
            "cosine",
            F.round(F.expr(S.dot_expr("va", "vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cosine") >= threshold)
    )
    dups = (
        pairs.groupBy("ib")
        .agg(F.min(F.struct("ia", "cosine")).alias("m"))
        .select(
            F.col("ib").alias("vec_id"),
            F.col("m.ia").alias("dup_of"),
            F.col("m.cosine").alias("cosine"),
        )
    )
    return (
        emb.select("vec_id")
        .join(dups, "vec_id", "left")
        .select(
            "vec_id",
            F.col("dup_of").isNull().alias("kept"),
            "dup_of",
            "cosine",
        )
    )


# ----------------------------------------------------------- bloom filter

def _bloom_positions(col, m_bits: int, k: int):
    """k bit positions for one key, computed JVM-side: xxhash64 with k
    seeds, pmod'd into the bitmap — build and probe share this exact
    expression, so membership needs no Python re-implementation of the
    hash."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )


def build_bloom_bits(df: DataFrame, col, m_bits: int = 1 << 20, k: int = 5):
    """Distributed Bloom-filter build: per-partition numpy bitmaps
    OR-reduced on the driver.

    Positions are computed in codegen (one narrow projection); each
    task sets bits into a local ``m_bits/8``-byte array and emits it
    once, so the driver receives one bitmap per partition (128 KiB at
    the 2^20 default) and ORs them — the treeAggregate shape.  Returns
    a uint64 word array small enough to ship in a task closure.
    """
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    n_words = m_bits // 64

    def _partials(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        bits = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            if len(pdf):
                pos = np.concatenate([np.asarray(p, dtype=np.int64) for p in pdf["pos"]])
                np.bitwise_or.at(
                    bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
                )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    rows = (
        df.select(_bloom_positions(col, m_bits, k).alias("pos"))
        .mapInPandas(_partials, "bits BINARY")
        .collect()
    )
    out = np.zeros(n_words, dtype=np.uint64)
    for r in rows:
        out |= np.frombuffer(r["bits"], dtype=np.uint64)
    return out


def bloom_filter_rows(
    df: DataFrame, col, bits, k: int = 5
) -> DataFrame:
    """Keep rows whose key MIGHT be in the filter (no false negatives).
    Positions come from the same codegen expression as the build; the
    membership test is a vectorized numpy gather per Arrow batch."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    m_bits = len(bits) * 64

    def _test(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            if not len(pdf):
                continue
            pos = np.stack([np.asarray(p, dtype=np.int64) for p in pdf["__bpos"]])
            hit = (
                (bits[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63)))
                & np.uint64(1)
            ).astype(bool).all(axis=1)
            out = pdf.loc[hit].drop(columns=["__bpos"])
            if len(out):
                yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.withColumn("__bpos", _bloom_positions(col, m_bits, k)).mapInPandas(
        _test, schema
    )


def decontaminate_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Benchmark decontamination via a Bloom prefilter — the scale path
    of :func:`contamination_check` for when the benchmark's shingle
    vocabulary is too large to broadcast as an equi-join build side
    but fits as BITS (2^20 bits = 128 KiB covers ~10^5 shingles at
    ~2% FPR; 2^30 = 128 MiB covers ~10^8).

    Corpus shingles are bloom-tested first (zero shuffle, vectorized
    bit gather); only SURVIVORS reach the exact verification join, and
    Bloom's no-false-negative guarantee makes the final ratios exactly
    those of the broadcast-join implementation — the filter narrows
    the join, never the answer.
    """
    bench_sh = (
        _doc_shingles(benchmark)
        .select(F.explode("shingles").alias("s"))
        .distinct()
    )
    bits = build_bloom_bits(bench_sh, F.col("s"), m_bits, k)
    corpus = _doc_shingles(docs).filter(F.col("n_sh") > 0)
    exploded = corpus.select("doc_id", "n_sh", F.explode("shingles").alias("s"))
    candidates = bloom_filter_rows(exploded, F.col("s"), bits, k)
    verified = candidates.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "s", "left"
    )
    ratios = (
        verified.groupBy("doc_id", "n_sh")
        .agg(F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("hits"))
        .withColumn("contamination", F.round(F.col("hits") / F.col("n_sh"), 6))
    )
    return (
        ratios.filter(F.col("contamination") >= threshold)
        .select("doc_id", "contamination")
    )


def editdistance_verify_pairs(
    docs: DataFrame, pairs: DataFrame, max_ratio: float = 0.4
) -> DataFrame:
    """Second-stage near-dup VERIFICATION by normalized edit distance:
    ``levenshtein(a, b) / greatest(len(a), len(b)) <= max_ratio``.

    Candidate generation (MinHash/SimHash) is order-insensitive —
    shuffled word bags collide; edit distance is the order-SENSITIVE
    check layered on top, and it is O(|a|*|b|) per pair, which is
    exactly why it only ever runs on the CANDIDATE pairs, never
    all-pairs.  Both the distance (Spark's JVM ``levenshtein``) and
    the ratio arithmetic replicate exactly in DuckDB, so the verified
    set is oracle-checkable.  -> (ia, ib, lev, ratio).
    """
    a = docs.select(
        F.col("doc_id").alias("ia"), F.col("text").alias("__ta")
    )
    b = docs.select(
        F.col("doc_id").alias("ib"), F.col("text").alias("__tb")
    )
    return (
        pairs.join(a, "ia")
        .join(b, "ib")
        .withColumn("lev", F.levenshtein("__ta", "__tb"))
        .withColumn(
            "ratio",
            F.round(
                F.col("lev")
                / F.greatest(F.length("__ta"), F.length("__tb")),
                6,
            ),
        )
        .filter(F.col("ratio") <= max_ratio)
        .select("ia", "ib", "lev", "ratio")
    )


def connected_components(edges: DataFrame, max_rounds: int = 25) -> DataFrame:
    """Connected components with POINTER JUMPING: O(log diameter)
    rounds, the union-find analogue for graphs whose duplicate chains
    are LONG (page-overlap chains, crawl mirrors) where plain
    smallest-label propagation (``duplicate_cluster_representatives``)
    needs O(diameter) rounds.

    Each round does (1) one min-propagation step — every node adopts
    the smallest label among itself and its neighbors — and (2) one
    pointer jump — ``label[v] <- label[label[v]]`` — so label trees
    halve in height per round (the Hash-to-Min posture of Rastogi et
    al., "Finding Connected Components in Map-Reduce", ICDE'13,
    public-domain algorithm).  A 1M-hop chain resolves in ~20 rounds
    instead of 1M.  Per round: two equi-joins + one partial-aggregable
    min — all shuffle-on-key, working set |V(pairs)| not corpus size;
    label state is localCheckpoint'ed so lineage stays flat.

    At fixpoint labels are constant across every edge and equal to the
    component minimum (labels only ever take existing node ids and are
    monotone non-increasing; the minimum node keeps its own id).
    Returns (id, component)."""
    und = edges.select(F.col("a").cast("long").alias("a"),
                       F.col("b").cast("long").alias("b"))
    und = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        und.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("rep", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # (1) min-propagation over edges
        nbr = (
            und.join(labels, und.b == labels.id)
            .groupBy("a")
            .agg(F.min("rep").alias("nbr_min"))
        )
        lab1 = (
            labels.join(nbr, labels.id == nbr.a, "left")
            .select(
                "id",
                F.least(
                    F.col("rep"), F.coalesce(F.col("nbr_min"), F.col("rep"))
                ).alias("rep"),
            )
        )
        # (2) pointer jump: rep <- rep[rep] (tree height halves)
        jump = lab1.select(
            F.col("id").alias("jid"), F.col("rep").alias("jrep")
        )
        lab2 = (
            lab1.join(jump, lab1.rep == jump.jid, "left")
            .select(
                "id",
                F.least(
                    F.col("rep"), F.coalesce(F.col("jrep"), F.col("rep"))
                ).alias("rep"),
            )
            .localCheckpoint()
        )
        changed = (
            lab2.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.rep") != F.col("o.rep"))
            .limit(1)
            .count()
        )
        labels = lab2
        if not changed:
            break
    else:
        # exhausting the round budget with labels still moving would
        # silently return labels that are NOT component minima — that
        # must be loud, not a quietly-wrong dedup keyspace.  25 rounds
        # covers diameters up to ~2^25 under pointer jumping; hitting
        # this means the budget, not the algorithm, is wrong.
        und.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within {max_rounds} "
            "rounds (labels still changing); raise max_rounds"
        )
    und.unpersist()
    return labels.select(F.col("id"), F.col("rep").alias("component"))


def chunk_dedup(docs: DataFrame, chunk_words: int = 10) -> DataFrame:
    """CCNet-style sub-document dedup (Wenzek et al. 2020 dedups SHA1'd
    paragraphs corpus-wide; reference parity: the pipeline's
    paragraph-hash stage): split every document into fixed
    ``chunk_words``-word chunks, keep each distinct chunk's FIRST
    occurrence in (doc_id, position) order, and reassemble what
    survives per document.

    Scale shape: chunking is per-row codegen (split + sequence +
    slice); first-occurrence election is ONE window partitioned by the
    chunk text — millions of small partitions, rank<=1 rides the
    map-side Partial WindowGroupLimit — and reassembly is a per-doc
    groupBy whose state is bounded by the document's own chunk count.
    No driver collect anywhere.  -> (doc_id, n_chunks, n_kept,
    kept_text)."""
    cw = int(chunk_words)
    # split ONCE into a projected column: the old in-lambda
    # ``slice(split(text), …)`` re-split the whole document for every
    # chunk (Catalyst does not CSE inside lambda bodies), making the
    # chunking pass O(doc_len × n_chunks) instead of O(doc_len)
    w = docs.select("doc_id", F.split("text", " ").alias("w"))
    chunks = w.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(w) "
                f"/ {cw}.0) AS INT) - 1), "
                f"i -> array_join(slice(w, i * {cw} + 1, {cw}), ' '))"
            )
        ).alias("pos", "chunk"),
    )
    w = Window.partitionBy("chunk").orderBy("doc_id", "pos")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1, F.struct("pos", "chunk")
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("kept_text"),
        )
    )
