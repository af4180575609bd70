"""Deterministic sampling and sequence packing for training pipelines.

`df.sample()` is seed-dependent per partitioning and `sampleBy` is
approximate — neither is reproducible across engines or cluster
layouts. Training-data curation needs REPRODUCIBLE subsets (the same
doc keeps/drops on every rerun and in every audit query), so sampling
here is hash-gated: keep iff h(key) mod 10^4 < rate.  The same md5-
derived 60-bit hash exists in DuckDB (hashing.py), so samples are
oracle-checkable.

`pack_sequences` is the batch-packing step of an LLM data pipeline:
assign documents to training batches of ~`budget` tokens, preserving a
deterministic document order.  The exclusive running token sum is
computed scalably: partition-local window sums inside coarse chunks +
a tiny driver-side chunk-offset table (never a single global sort
partition).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from iceberg_geo_poc_spark.operators.hashing import spark_hash60

RATE_DENOM = 10_000


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep a reproducible ``fraction`` of rows, gated on a hash of
    ``key`` (+ optional salt for independent resamples)."""
    gate = int(fraction * RATE_DENOM)
    h = spark_hash60(f"concat(CAST({key} AS STRING), '{salt}')")
    return df.filter(F.expr(f"pmod({h}, {RATE_DENOM})") < gate)


def stratified_sample(
    df: DataFrame, key: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic rates (exact-rate analogue of
    ``sampleBy``); strata absent from ``fractions`` are dropped."""
    h = F.expr(f"pmod({spark_hash60(f'CAST({key} AS STRING)')}, {RATE_DENOM})")
    gate = None
    for stratum, frac in fractions.items():
        g = int(frac * RATE_DENOM)
        cond = (F.col(strata_col) == stratum) & (h < g)
        gate = cond if gate is None else (gate | cond)
    return df.filter(gate)


def pack_sequences(
    docs: DataFrame,
    order_col: str,
    token_col,
    budget: int,
    chunk: int = 100_000,
) -> DataFrame:
    """Assign each document a ``batch_id`` so consecutive documents (in
    ``order_col`` order) fill ~``budget``-token training batches:
    batch_id = floor(exclusive_running_token_sum / budget).

    Scale shape: the running sum never funnels through one partition —
    rows window-sum inside ``chunk``-sized ranges of ``order_col``
    (parallel), and chunk offsets (one row per chunk) prefix-sum on the
    driver and broadcast-join back.
    """
    tok = token_col if not isinstance(token_col, str) else F.col(token_col)
    df = docs.withColumn("__tok", tok.cast("long")).withColumn(
        "__chunk", F.floor(F.col(order_col) / chunk).cast("long")
    )
    w = Window.partitionBy("__chunk").orderBy(order_col)
    df = df.withColumn("__local_incl", F.sum("__tok").over(w))
    totals = {
        r["__chunk"]: r["total"]
        for r in df.groupBy("__chunk").agg(F.sum("__tok").alias("total")).collect()
    }
    offsets, acc = [], 0
    for c in sorted(totals):
        offsets.append((c, acc))
        acc += totals[c]
    off_df = df.sparkSession.createDataFrame(
        offsets, "__chunk LONG, __offset LONG"
    )
    return (
        df.join(F.broadcast(off_df), "__chunk")
        .withColumn(
            "batch_id",
            F.floor(
                (F.col("__offset") + F.col("__local_incl") - F.col("__tok"))
                / budget
            ),
        )
        .drop("__tok", "__chunk", "__local_incl", "__offset")
    )


def fixed_block_spans(
    docs: DataFrame,
    order_col: str,
    token_col,
    block: int,
    chunk: int = 100_000,
) -> DataFrame:
    """GPT-style pretraining chunking: concatenate every document's
    tokens (in ``order_col`` order) into one global stream and cut it
    into fixed ``block``-token training blocks — a document CAN
    straddle blocks, so the output is one SPAN row per (block, doc)
    overlap: which slice of the doc lands in which block (the layout
    attention-mask / sample-boundary construction consumes).

    Scale shape: global token offsets use the same two-phase prefix sum
    as ``pack_sequences`` (per-``chunk`` window sums in parallel, chunk
    offsets prefix-summed on the driver — one row per chunk — and
    broadcast back); the block fan-out is a codegen ``sequence`` +
    ``explode`` bounded per row by ceil(doc_tokens / block) + 1.  No
    single-reducer sort, no Python.

    -> (block_id, doc_id(order_col), start_tok, n_toks) with
    ``start_tok`` 0-based within the document.
    """
    tok = token_col if not isinstance(token_col, str) else F.col(token_col)
    df = docs.withColumn("__tok", tok.cast("long")).withColumn(
        "__chunk", F.floor(F.col(order_col) / chunk).cast("long")
    )
    w = Window.partitionBy("__chunk").orderBy(order_col)
    df = df.withColumn("__local_incl", F.sum("__tok").over(w))
    totals = {
        r["__chunk"]: r["total"]
        for r in df.groupBy("__chunk").agg(F.sum("__tok").alias("total")).collect()
    }
    offsets, acc = [], 0
    for c in sorted(totals):
        offsets.append((c, acc))
        acc += totals[c]
    off_df = df.sparkSession.createDataFrame(
        offsets, "__chunk LONG, __offset LONG"
    )
    b = int(block)
    g = (
        df.join(F.broadcast(off_df), "__chunk")
        .withColumn(
            "__gstart",
            F.col("__offset") + F.col("__local_incl") - F.col("__tok"),
        )
        .filter(F.col("__tok") > 0)
        .withColumn(
            "block_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("__gstart") / b),
                    F.floor((F.col("__gstart") + F.col("__tok") - 1) / b),
                )
            ),
        )
    )
    blk_start = F.col("block_id") * b
    blk_end = blk_start + b  # exclusive
    doc_end = F.col("__gstart") + F.col("__tok")  # exclusive
    start_in_doc = F.greatest(blk_start, F.col("__gstart")) - F.col("__gstart")
    n_toks = F.least(blk_end, doc_end) - F.greatest(blk_start, F.col("__gstart"))
    return g.select(
        F.col("block_id").cast("long").alias("block_id"),
        F.col(order_col),
        start_in_doc.cast("long").alias("start_tok"),
        n_toks.cast("long").alias("n_toks"),
    ).orderBy("block_id", order_col)


def mixture_sample(
    df: DataFrame, key: str, domain_col: str, target_weights: dict[str, float]
) -> DataFrame:
    """Reshape the corpus to a target domain mixture WITHOUT upsampling
    (the Pile/DoReMi-style mixture step): find the largest total T such
    that every domain d can supply ``T * w_d`` documents, then keep each
    domain at rate ``T * w_d / n_d`` via the deterministic hash gate.
    Domains absent from ``target_weights`` are dropped.

    One bounded groupBy (rows = #domains) feeds the rate computation on
    the driver; the keep-pass is a single hash-gated filter — the same
    linear shape as stratified_sample, reproducible across engines and
    reruns.  (Upsampling variant — repeat small domains — is a training-
    loader concern; the curation layer only downsamples.)
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
        if r[0] in target_weights
    }
    missing = set(target_weights) - set(counts)
    if missing:
        raise ValueError(f"domains absent from corpus: {sorted(missing)}")
    total = min(counts[d] / w for d, w in target_weights.items())
    fractions = {
        d: min(1.0, total * w / counts[d]) for d, w in target_weights.items()
    }
    return stratified_sample(df, key, domain_col, fractions)


def temperature_mixture_sample(
    df: DataFrame, key: str, domain_col: str, alpha: float = 0.7
) -> DataFrame:
    """Temperature-flattened mixture (the multilingual-sampling rule of
    mBERT/XLM-R: sample domain d proportionally to ``n_d ** alpha``,
    alpha < 1 up-weights small domains RELATIVELY by shrinking big
    ones).  Downsampling-only, like :func:`mixture_sample` — weights
    are the unnormalized ``round(n_d**alpha, 6)`` (mixture arithmetic
    is scale-invariant, and skipping normalization keeps the float
    path short enough to replicate exactly in SQL).  Same bounded
    group-count + deterministic hash gate shape."""
    counts = {
        r[0]: r[1]
        for r in df.groupBy(domain_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    weights = {d: round(n**alpha, 6) for d, n in counts.items()}
    total = min(counts[d] / w for d, w in weights.items())
    fractions = {
        d: min(1.0, total * w / counts[d]) for d, w in weights.items()
    }
    return stratified_sample(df, key, domain_col, fractions)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    round_digits: int = 12,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    each row draws u from its deterministic hash and scores
    ``u ** (1/w)``; the k LARGEST scores win — inclusion probability is
    proportional to weight, one pass, no replacement bookkeeping.

    Deterministic u (the md5 hash gate, same as deterministic_sample)
    makes the chosen set reproducible and cross-engine checkable; the
    score is rounded before ranking (ties broken by key) so double-pow
    ulp differences between engines cannot flip the order.  Shape: one
    codegen projection + one top-k (TakeOrdered) — at 100 TB only k
    rows survive to the driver/shuffle.
    """
    from iceberg_geo_poc_spark.operators.hashing import spark_hash60

    h = spark_hash60(f"CAST({key} AS STRING)")
    u = f"(({h}) % {RATE_DENOM}) / CAST({RATE_DENOM} AS DOUBLE)"
    score = F.round(
        F.expr(f"power({u}, 1.0 / {weight_col})"), round_digits
    )
    return (
        df.withColumn("__score", score)
        .orderBy(F.desc("__score"), F.asc(key))
        .limit(k)
        .drop("__score")
    )


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Deterministic 3-way split: adds a ``split`` column
    ('train' | 'val' | 'test') gated on the content hash of ``key`` —
    the same document lands in the same split on every rerun, on every
    engine, and across corpus growth (new docs never move old ones,
    unlike ``randomSplit``).  Contamination-safe by construction when
    ``key`` is a dedup-stable id."""
    g_val = int(val_frac * RATE_DENOM)
    g_test = g_val + int(test_frac * RATE_DENOM)
    keyed = f"concat(CAST({key} AS STRING), '{salt}')"
    h = F.expr(f"pmod({spark_hash60(keyed)}, {RATE_DENOM})")
    return df.withColumn(
        "split",
        F.when(h < g_val, "val")
        .when(h < g_test, "test")
        .otherwise("train"),
    )


def kcenter_coreset(
    emb: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center (farthest-point) CORESET selection over an
    embedding column: start from the smallest id, then k-1 times pick
    the point farthest from the chosen set (max-min distance, ties to
    the smaller id) — the classic 2-approximation for the k-center
    cover (Gonzalez 1985), the standard diversity-sampling pass of a
    training-data pipeline.

    Scale posture: k DRIVER-side rounds; each round is ONE codegen scan
    (squared-L2 fold against the current centers, broadcast as array
    literals — no shuffle) plus a global top-1 reduce (TakeOrdered).
    O(k * n * dim) distance work total, no pairwise matrix ever
    materializes, and the only driver state is k center vectors.
    Returns (step, vec_id): the selection order."""
    dist_sq = (
        "aggregate(zip_with({v}, {c}, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, (acc, t) -> acc + t)"
    )
    base = emb.select(id_col, vec_col)
    first = base.select(F.min(id_col).alias("m")).first()["m"]
    chosen = [(1, first)]
    center_exprs: list[str] = []
    for step in range(2, k + 1):
        vec = (
            base.filter(F.col(id_col) == chosen[-1][1])
            .select(vec_col)
            .first()[0]
        )
        lit = "array(" + ", ".join(f"CAST({float(x)} AS DOUBLE)" for x in vec) + ")"
        center_exprs.append(dist_sq.format(v=vec_col, c=lit))
        mind = F.least(*[F.expr(e) for e in center_exprs]) if len(
            center_exprs
        ) > 1 else F.expr(center_exprs[0])
        nxt = (
            base.select(id_col, mind.alias("mind"))
            .orderBy(F.desc("mind"), F.asc(id_col))
            .first()
        )
        chosen.append((step, nxt[id_col]))
    return emb.sparkSession.createDataFrame(
        chosen, f"step INT, {id_col} LONG"
    ).orderBy("step")


def dsir_importance(
    docs: DataFrame,
    key: str,
    text_col: str,
    target_pred: str,
    num_buckets: int = 512,
    k: int = 100,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): select raw-corpus documents that look like a TARGET domain
    under a bag-of-hashed-ngrams model.

    Features are unigrams + word bigrams hashed into ``num_buckets``
    buckets (the cross-engine md5-60 hash).  Two multinomials are fit
    with add-1 smoothing — p over the target rows (``target_pred``
    true), q over the whole corpus — and each document scores its
    log importance weight ``sum_b c_b * (ln p_b - ln q_b)``.  The
    resampling step is Gumbel top-k: a deterministic per-document
    Gumbel draw (from the same hash gate the samplers use) perturbs
    the log weight and the k largest win — i.e. sampling WITHOUT
    replacement proportional to the importance weights, reproducible
    on every rerun and in the DuckDB oracle.

    Scale posture: everything is codegen (split/transform/explode/
    conv(md5)/pmod) + partial aggregation.  The lambda table is at
    most ``num_buckets`` rows, broadcast to the per-doc count join;
    the final step is one TakeOrdered — only k rows reach the driver.
    The exploded feature stream is aggregated twice (bucket totals,
    per-doc counts), i.e. two scans of the corpus, both shuffle-light.
    Reference analogue: none (data-selection layer above the table
    format); published algorithm, original implementation.

    Returns (key, dsir_logw_e8, gumbel_key_e8) for the k selected
    rows, both scores as BIGINTs scaled by 1e8.  Rounding a DOUBLE
    score is NOT enough here: lambdas rounded to 1e-8 multiples make
    per-doc sums land exactly on decimal rounding boundaries, where
    ln/sum-order ulp skew between engines flips the last digit (seen
    live at sf0.01).  Instead each lambda is scaled to an integer once
    (the only float->int boundary, ~1e-8 flip probability per bucket)
    and everything downstream — per-doc weighted sum, Gumbel add,
    ranking — is exact integer arithmetic on both engines.
    """
    bigrams = (
        "CASE WHEN size(__w) >= 2 THEN "
        "transform(sequence(0, size(__w) - 2), "
        "i -> concat(__w[i], ' ', __w[i+1])) "
        "ELSE slice(__w, 1, 0) END"
    )
    feats = docs.selectExpr(
        f"{key} AS __k",
        f"CAST({target_pred} AS INT) AS __t",
        f"split({text_col}, ' ') AS __w",
    ).selectExpr(
        "__k", "__t", f"explode(concat(__w, {bigrams})) AS __f"
    )
    b = feats.selectExpr(
        "__k", "__t",
        f"pmod({spark_hash60('__f')}, {num_buckets}) AS __b",
    )
    bucket = b.groupBy("__b").agg(
        F.count("*").alias("__r"), F.sum("__t").alias("__g")
    )
    tot = bucket.agg(
        F.sum("__r").alias("__rt"), F.sum("__g").alias("__gt")
    )
    lam = bucket.crossJoin(F.broadcast(tot)).selectExpr(
        "__b",
        f"CAST(ROUND((LN((__g + 1.0) / (__gt + {num_buckets})) - "
        f"LN((__r + 1.0) / (__rt + {num_buckets}))) * 1e8, 0) AS BIGINT)"
        " AS __lam",
    )
    per_doc = b.groupBy("__k", "__b").agg(F.count("*").alias("__c"))
    scored = (
        per_doc.join(F.broadcast(lam), "__b")
        .groupBy("__k")
        .agg(F.sum(F.col("__c") * F.col("__lam")).alias("dsir_logw_e8"))
    )
    h = spark_hash60("CAST(__k AS STRING)")
    gumbel = (
        f"CAST(ROUND(-LN(-LN((({h}) % {RATE_DENOM} + 0.5) / "
        f"CAST({RATE_DENOM} AS DOUBLE))) * 1e8, 0) AS BIGINT)"
    )
    return (
        scored.withColumn("__gkey", F.expr(f"dsir_logw_e8 + {gumbel}"))
        .orderBy(F.desc("__gkey"), F.asc("__k"))
        .limit(k)
        .selectExpr(
            f"__k AS {key}", "dsir_logw_e8", "__gkey AS gumbel_key_e8"
        )
    )


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tie_col: str,
    n: int,
) -> DataFrame:
    """Exact per-group top-N (ORDER BY order_col DESC, tie_col ASC) —
    the per-domain document cap of crawl pipelines ("keep at most N
    best pages per host", C4/RefinedWeb keep-lists).

    Scale note (Spark-first: let the optimizer do it): a plain
    ``row_number() OVER (PARTITION BY group) <= n`` looks like the
    classic dominant-key single-reducer sort, but Spark >= 3.5 rewrites
    rank-limit windows with **WindowGroupLimit** — a PARTIAL top-N runs
    map-side BEFORE the shuffle, so the final per-group task sees at
    most n x num_map_partitions rows no matter how hot the domain.
    tests/test_plan_shapes.py asserts the Partial WindowGroupLimit is
    present so a Spark regression (or a plan change that defeats the
    pushdown — e.g. a non-rank function in the same window) fails
    loudly.  Contrast ``skew.distributed_ntile``: NTILE carries no
    rank-limit filter, gets no pushdown, and genuinely needs the
    histogram rewrite.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.desc(order_col), F.asc(tie_col)
    )
    return df.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= n
    )


def preference_pairs(
    df: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str,
    min_margin: float = 0.0,
) -> DataFrame:
    """DPO/RLHF preference-pair construction: within each group (the
    'prompt'), pair the HIGHEST-scoring candidate (chosen) with the
    LOWEST (rejected), keeping groups whose score margin clears
    ``min_margin`` — the standard best-vs-worst pairing for preference
    data built from a scalar reward/quality signal.

    Scale shape: two rank-limit windows over the same relation (both
    ride the map-side WindowGroupLimit — per-group state is ONE row
    each side regardless of candidates-per-prompt), one equi-join on
    the group key.  Deterministic: ties break on ``id_col`` (chosen
    takes the smallest id among maxima, rejected the smallest among
    minima), so the pair set is engine-stable.
    -> (group, chosen_id, rejected_id, chosen_score, rejected_score,
    margin)."""
    w_top = Window.partitionBy(group_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    w_bot = Window.partitionBy(group_col).orderBy(
        F.asc(score_col), F.asc(id_col)
    )
    chosen = (
        df.withColumn("__r", F.row_number().over(w_top))
        .filter(F.col("__r") == 1)
        .select(
            group_col,
            F.col(id_col).alias("chosen_id"),
            F.col(score_col).alias("chosen_score"),
        )
    )
    rejected = (
        df.withColumn("__r", F.row_number().over(w_bot))
        .filter(F.col("__r") == 1)
        .select(
            group_col,
            F.col(id_col).alias("rejected_id"),
            F.col(score_col).alias("rejected_score"),
        )
    )
    return (
        chosen.join(rejected, group_col)
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .withColumn(
            "margin",
            F.round(F.col("chosen_score") - F.col("rejected_score"), 6),
        )
        .filter(F.col("margin") >= min_margin)
    )
