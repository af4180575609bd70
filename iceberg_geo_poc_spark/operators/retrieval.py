"""Lexical + hybrid retrieval: BM25 scoring and reciprocal-rank fusion.

Training-data curation leans on retrieval twice: (a) query-based corpus
filtering / decontamination ("find documents matching the benchmark
prompt") and (b) hybrid dedup-and-rank pipelines that fuse a lexical
signal with an embedding signal before selecting canonical documents.
This module supplies both halves Spark-first:

- ``bm25_scores`` — Okapi BM25 (Robertson et al.; the Lucene-style
  "+1" idf so scores stay positive) computed with TWO partial-agg
  groupBys (term stats, doc lengths) and ONE equi-join; query terms are
  a broadcast literal.  No Python in the plan, no all-pairs anywhere:
  at 100 TB the (doc, term) aggregate is the canonical map-side-combine
  case and everything downstream is term-keyed.
- ``rrf_fuse`` — reciprocal-rank fusion (Cormack et al. 2009):
  ``score = sum_r 1/(k0 + rank_r)`` over the input rankings, here the
  BM25 list and a cosine list.  Rank computation is one window per
  ranking over already-aggregated rows.

Parity: the reference has no retrieval surface (it defers execution to
the host engine); this is SURVEY §2.12 north-star scope on the same
substrate as tfidf_top_terms (operators/text.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iceberg_geo_poc_spark.operators.text import with_words

RRF_K = 60  # the constant from the RRF paper; callers may override


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Per-document Okapi BM25 for ``query_terms``.

    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))   [Lucene's variant]
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b*dl/avgdl))

    -> (doc_id, bm25) for every document containing >= 1 query term.
    """
    tf = (
        with_words(docs)
        .select("doc_id", F.size("words").alias("dl"),
                F.explode("words").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    # corpus stats: N and avgdl (one tiny aggregate, broadcast)
    stats = with_words(docs).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.size("words")).alias("avgdl"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qt = F.array(*[F.lit(t) for t in query_terms])
    scored = (
        tf.filter(F.array_contains(qt, F.col("term")))
        .join(F.broadcast(dfreq.filter(F.array_contains(qt, F.col("term")))), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("w"), 6).alias("bm25")
    )


def rrf_fuse(
    rankings: list[DataFrame], id_col: str = "doc_id", k0: int = RRF_K
) -> DataFrame:
    """Fuse rank lists by reciprocal rank: each input DataFrame must
    carry (id_col, rank).  -> (id_col, rrf, n_lists) ordered best-first.
    Missing ids simply contribute nothing from that list (standard RRF).
    """
    contribs = [
        r.select(
            F.col(id_col),
            (1.0 / (F.lit(k0) + F.col("rank"))).alias("c"),
        )
        for r in rankings
    ]
    unioned = contribs[0]
    for c in contribs[1:]:
        unioned = unioned.unionByName(c)
    return (
        unioned.groupBy(id_col)
        .agg(
            F.round(F.sum("c"), 6).alias("rrf"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf"), F.asc(id_col))
    )


def ranked(scored: DataFrame, score_col: str, id_col: str = "doc_id") -> DataFrame:
    """(id, score) -> (id, rank) with deterministic tie-break by id."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
    return scored.select(id_col, F.row_number().over(w).alias("rank"))


def splade_sparse_scores(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """SPLADE-shaped SPARSE-VECTOR retrieval for a query batch: both
    sides expand to sparse term->weight maps with the log-saturated
    form the SPLADE family popularized (Formal et al. 2021 — there the
    weights come from a learned MLM head; here, with no model in the
    container, the same w(t) = log(1 + tf(t)) * idf(t) saturation, so
    the OPERATOR — distributed sparse dot-product retrieval — is real
    while the expansion stays deterministic).  score(q, d) =
    sum_t w_q(t) * w_d(t).

    Scale posture: the doc-side sparse matrix is one partial-agg
    groupBy (doc, term); the query batch is a broadcast literal; the
    dot product is ONE term-keyed equi-join + one (query, doc) sum —
    the canonical sparse-retrieval join, no densification, no
    all-pairs.  Top-k per query via a per-query window over the scored
    rows.  -> (query_id, doc_id, score, rank), rank <= k.
    """
    spark = docs.sparkSession
    tf = (
        with_words(docs)
        .select("doc_id", F.explode("words").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_docs = docs.count()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfreq.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
              / (F.col("df") + 0.5)).alias("idf"),
    )
    dw = tf.join(idf, "term").select(
        "term", "doc_id",
        (F.log(F.lit(1.0) + F.col("tf")) * F.col("idf")).alias("wd"),
    )
    qdf = spark.createDataFrame(queries, "query_id INT, qtext STRING")
    qtf = (
        qdf.select(
            "query_id", F.explode(F.split("qtext", " ")).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count(F.lit(1)).alias("qtf"))
    )
    qw = qtf.join(idf, "term").select(
        "query_id", "term",
        (F.log(F.lit(1.0) + F.col("qtf")) * F.col("idf")).alias("wq"),
    )
    scored = (
        dw.join(F.broadcast(qw), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(F.col("wd") * F.col("wq")), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negative_mining(
    docs: DataFrame,
    emb: DataFrame,
    queries: list[tuple[int, str]],
    k_lex: int = 10,
    k_neg: int = 5,
) -> DataFrame:
    """HARD-NEGATIVE mining for retrieval/embedding training (the
    ANCE/DPR-style curation step): for each query, the lexical top-1
    document is the POSITIVE; hard negatives are the documents most
    cosine-similar to the positive's embedding that did NOT make the
    lexical top-k — semantically close, lexically unmatched, exactly
    the pairs contrastive training needs.

    Scale posture: the lexical stage is ``splade_sparse_scores`` (one
    term-keyed equi-join); the positives (|queries| rows) collect to the
    driver and broadcast as literal vectors, so the cosine stage is one
    codegen scan of the embedding table (no pairwise matrix); the
    exclusion set (|queries| x k_lex ids) broadcasts into an anti-join;
    one per-query top-k window finishes.  -> (query_id, positive_id,
    negative_id, cosine, neg_rank)."""
    lex = splade_sparse_scores(docs, queries, k=k_lex)
    pos = {
        r.query_id: r.doc_id for r in lex.filter(F.col("rank") == 1).collect()
    }
    spark = docs.sparkSession
    vec_of = {
        r.vec_id: r.embedding
        for r in emb.filter(
            F.col("vec_id").isin(list(pos.values()))
        ).collect()
    }
    dot = (
        "aggregate(zip_with(embedding, {c}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, t) -> acc + t)"
    )
    norm = (
        "sqrt(aggregate(zip_with(embedding, embedding, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, t) -> acc + t))"
    )
    out_schema = (
        "query_id long, positive_id long, negative_id long, "
        "cosine double, neg_rank long"
    )
    parts = []
    for qid, pid in sorted(pos.items()):
        v = vec_of.get(pid)
        if v is None:
            # a lexical positive with no embedding row cannot anchor a
            # cosine stage; skip the query rather than KeyError mid-plan
            continue
        import math

        pnorm = math.sqrt(sum(float(x) * float(x) for x in v))
        lit = "array(" + ", ".join(f"CAST({float(x)} AS DOUBLE)" for x in v) + ")"
        parts.append(
            emb.select(
                F.lit(qid).alias("query_id"),
                F.lit(pid).alias("positive_id"),
                F.col("vec_id").alias("negative_id"),
                F.round(
                    F.expr(dot.format(c=lit)) / (F.expr(norm) * F.lit(pnorm)),
                    6,
                ).alias("cosine"),
            )
        )
    if not parts:
        # no query produced both a lexical positive and an embedding:
        # a well-typed empty result, not an IndexError
        return spark.createDataFrame([], out_schema)
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    lex_ids = lex.select(
        F.col("query_id"), F.col("doc_id").alias("negative_id")
    )
    cand = cand.join(lex_ids, ["query_id", "negative_id"], "left_anti")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("negative_id")
    )
    return (
        cand.withColumn("neg_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("neg_rank") <= k_neg)
        .orderBy("query_id", "neg_rank")
    )


def margin_bitext_mining(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    _materialize: bool = True,
) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019; the CCMatrix
    / LASER parallel-corpus mining criterion): a (src, tgt) pair is a
    translation candidate when its cosine similarity stands OUT of both
    sides' neighborhoods —

        margin(x, y) = cos(x, y) /
            ( avg_{z in NN_k(x)} cos(x, z)/2 + avg_{z in NN_k(y)} cos(y, z)/2 )

    ("ratio" margin; NN_k over the OTHER side).  Output keeps each
    source's best target when the margin clears ``threshold``.

    Scale shape: one block-and-verify cosine matrix src x tgt (the same
    documented bounded-crossJoin kernel as the brute ANN baselines —
    at corpus scale the matrix stage swaps for the IVF/LSH bucketed
    kernels, the margin algebra is unchanged); both k-NN averages are
    windowed top-k over that SAME scored frame (map-side Partial
    WindowGroupLimit), so the matrix is computed once; the final
    argmax-per-source is one more rank window.  No driver collects.

    -> (src_id, tgt_id, cosine, margin) for accepted pairs.
    """
    from iceberg_geo_poc_spark.operators.similarity import dot_expr, with_norm

    s = with_norm(src).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").cast("array<double>").alias("vs"),
        F.col("nrm").alias("ns"),
    )
    t = with_norm(tgt).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").cast("array<double>").alias("vt"),
        F.col("nrm").alias("nt"),
    )
    scored = (
        s.crossJoin(t)
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot_expr("vs", "vt")) / (F.col("ns") * F.col("nt")), 6
            ),
        )
        .select("src_id", "tgt_id", "cosine")
    )
    return _mine_and_release(scored, k, threshold, _materialize)


def _margin_mined(scored: DataFrame, k: int, threshold: float) -> DataFrame:
    """Ratio-margin algebra over a (src_id, tgt_id, cosine) frame:
    windowed k-NN averages per side, margin, per-source argmax,
    threshold.  Shared verbatim by the brute (full matrix) and bucketed
    (Hamming shortlist) miners — only candidate generation differs."""
    w_src = Window.partitionBy("src_id").orderBy(
        F.desc("cosine"), F.asc("tgt_id")
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.desc("cosine"), F.asc("src_id")
    )
    knn_src = (
        scored.withColumn("r", F.row_number().over(w_src))
        .filter(F.col("r") <= k)
        .groupBy("src_id")
        .agg(F.avg("cosine").alias("avg_src"))
    )
    knn_tgt = (
        scored.withColumn("r", F.row_number().over(w_tgt))
        .filter(F.col("r") <= k)
        .groupBy("tgt_id")
        .agg(F.avg("cosine").alias("avg_tgt"))
    )
    m = (
        scored.join(knn_src, "src_id")
        .join(knn_tgt, "tgt_id")
        .withColumn(
            "margin",
            F.round(
                F.col("cosine")
                / (F.col("avg_src") / 2 + F.col("avg_tgt") / 2),
                6,
            ),
        )
    )
    w_best = Window.partitionBy("src_id").orderBy(
        F.desc("margin"), F.asc("tgt_id")
    )
    return (
        m.withColumn("rk", F.row_number().over(w_best))
        .filter((F.col("rk") == 1) & (F.col("margin") >= threshold))
        .select("src_id", "tgt_id", "cosine", "margin")
    )


def margin_bitext_mining_bucketed(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    threshold: float = 1.05,
    shortlist: int = 80,
    band_bits: int | None = None,
    _materialize: bool = True,
) -> DataFrame:
    """Scale path for :func:`margin_bitext_mining` — the CCMatrix-size
    form (the brute miner's full src x tgt double-array matrix is a
    non-starter at 10^8 x 10^8).  Same composition as
    ``sim_hamming_rerank``:

    Stage 1 (candidates): both sides sign-bit quantize to ONE BIGINT
    (``binary_quantize_expr``), so the only all-pairs stage compares
    8-byte signatures with ``bit_count(xor)`` — two JVM intrinsics a
    pair, 64x less data than the 512-byte double arrays; the wide
    embedding arrays NEVER meet in a crossJoin.  Per-side Hamming
    top-``shortlist`` windows (map-side Partial WindowGroupLimit) keep
    O((n+m) * shortlist) candidate pairs.

    Stage 2: exact cosine ONLY on shortlisted pairs (equi-joins back to
    the vectors by id).

    Stage 3: the identical ratio-margin algebra (k-NN averages taken
    over shortlist candidates instead of the full matrix), argmax,
    threshold.

    Contract (tests/test_pipeline_operators.py): >= 0.9 of the brute
    miner's accepted pairs are reproduced at sf0.01 defaults (measured
    0.977 with shortlist=80 over 250 x 250).  On real bitext corpora
    translation pairs sit at cosine >= 0.8 where the Hamming gap to
    the background is far wider than on this synthetic near-random
    testdata, so the shortlist constant transfers conservatively.

    ``band_bits`` switches candidate generation to BANDED signature
    equi-joins (LSH banding over the sign signature: the 64 bits split
    into 64/band_bits bands; a pair is a candidate when ANY band
    matches exactly) — NO all-pairs stage of any kind remains in the
    plan.  This is the CCMatrix-scale regime: per-band collision
    probability for a pair at angle theta is (1 - theta/pi)^band_bits,
    so at translation-pair similarity (cosine >= 0.8, theta <= 37deg)
    8-bit bands catch >= 98% of true pairs with 4 bands while the
    near-orthogonal background collides at ~2^-band_bits per band.  On
    LOW-similarity corpora (like the synthetic testdata) banding has
    no signal — use the dense signature stage instead; both paths feed
    the identical shortlist windows and margin algebra.
    """
    from iceberg_geo_poc_spark.operators.similarity import (
        binary_quantize_expr,
        dot_expr,
        with_norm,
    )

    s = with_norm(src).select(
        F.col("vec_id").alias("src_id"),
        F.col("embedding").cast("array<double>").alias("vs"),
        F.col("nrm").alias("ns"),
    )
    t = with_norm(tgt).select(
        F.col("vec_id").alias("tgt_id"),
        F.col("embedding").cast("array<double>").alias("vt"),
        F.col("nrm").alias("nt"),
    )
    ssig = s.select("src_id", F.expr(binary_quantize_expr("vs")).alias("hs"))
    tsig = t.select("tgt_id", F.expr(binary_quantize_expr("vt")).alias("ht"))
    if band_bits:
        if 64 % band_bits:
            raise ValueError("band_bits must divide 64")
        n_bands = 64 // band_bits
        mask = (1 << band_bits) - 1
        bands = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftrightunsigned(sig, {b * band_bits}) & {mask}"
                        ).alias("value"),
                    )
                    for b in range(n_bands)
                ]
            )
        )
        sb = (
            ssig.withColumnRenamed("hs", "sig")
            .select("src_id", F.col("sig").alias("hs"), bands.alias("bv"))
            .select("src_id", "hs", "bv.band", "bv.value")
        )
        tb = (
            tsig.withColumnRenamed("ht", "sig")
            .select("tgt_id", F.col("sig").alias("ht"), bands.alias("bv"))
            .select("tgt_id", "ht", "bv.band", "bv.value")
        )
        # pure equi-join on (band, value): candidates only where a band
        # matches exactly; distinct before the Hamming rank so multi-band
        # collisions do not duplicate pairs
        ham = (
            sb.join(tb, ["band", "value"])
            .select("src_id", "tgt_id", "hs", "ht")
            .distinct()
            .withColumn("hamming", F.expr("bit_count(hs ^ ht)"))
            .select("src_id", "tgt_id", "hamming")
        )
    else:
        ham = (
            ssig.crossJoin(tsig)
            .withColumn("hamming", F.expr("bit_count(hs ^ ht)"))
            .select("src_id", "tgt_id", "hamming")
        )
    w_s = Window.partitionBy("src_id").orderBy(F.asc("hamming"), F.asc("tgt_id"))
    w_t = Window.partitionBy("tgt_id").orderBy(F.asc("hamming"), F.asc("src_id"))
    top_s = (
        ham.withColumn("r", F.row_number().over(w_s))
        .filter(F.col("r") <= shortlist)
        .select("src_id", "tgt_id")
    )
    top_t = (
        ham.withColumn("r", F.row_number().over(w_t))
        .filter(F.col("r") <= shortlist)
        .select("src_id", "tgt_id")
    )
    cand = top_s.union(top_t).distinct()
    # exact cosine only for shortlisted pairs
    scored = (
        cand.join(s, "src_id")
        .join(t, "tgt_id")
        .withColumn(
            "cosine",
            F.round(
                F.expr(dot_expr("vs", "vt")) / (F.col("ns") * F.col("nt")), 6
            ),
        )
        .select("src_id", "tgt_id", "cosine")
    )
    return _mine_and_release(scored, k, threshold, _materialize)


def _mine_and_release(
    scored: DataFrame, k: int, threshold: float, materialize: bool
) -> DataFrame:
    """Run the margin algebra over a persisted scored frame and RELEASE
    the cache before returning.

    The scored frame has three margin-algebra consumers (both k-NN
    windows + the final join), so it is persisted for the evaluation;
    the (small) mined output is then materialized eagerly
    (localCheckpoint) so the matrix cache can be unpersisted in this
    call — repeated calls must not accumulate cached blocks for the
    session lifetime (same hygiene as minhash_lsh_pairs /
    ngram_jaccard_pairs).  ``materialize=False`` is the plan-inspection
    escape hatch (tests assert WindowGroupLimit pushdown / no-all-pairs
    on the algebra's real plan, which the checkpoint would truncate);
    the caller then owns recomputation cost.
    """
    if not materialize:
        return _margin_mined(scored, k, threshold)
    scored = scored.persist()
    try:
        return _margin_mined(scored, k, threshold).localCheckpoint()
    finally:
        scored.unpersist()
