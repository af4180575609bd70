"""Skew-mitigation utilities for large joins and aggregations.

AQE's skew-join handling splits oversized *partitions*, but it only
kicks in for sort-merge joins and after materialization; when a single
JOIN KEY is hot (the classic power-law user_id), pre-salting is the
reliable fix at any scale:

- ``salted_join``: replicate the small(er) side ``salt`` times, salt the
  big side's key with a uniform shard, join on (key, shard). The hot
  key's rows spread over ``salt`` reducers instead of one straggler.
  Use when the small side is too big to broadcast but small enough to
  replicate ``salt``×.
- ``two_phase_count``: partial-then-final aggregation with an explicit
  salt column for extreme groupBy skew (a single group holding >1
  partition of rows). Spark's hash aggregate already does map-side
  partial aggregation; the explicit salt matters when per-key state is
  large (collect_list-like) rather than a counter.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_SALT = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``big ⋈ small`` on ``on``.

    big gets a random-uniform shard per row (rand is fine — the shard
    only balances work, it never affects results); small is exploded
    ``salt``× so every (key, shard) pair finds its match.  Output
    equals a plain join (shard columns dropped).

    Only ``inner`` and ``left`` (outer on the big side) are supported:
    for right/full joins the exploded small side would emit every
    unmatched small-side row ``salt`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "right/full would duplicate unmatched small-side rows salt times"
        )
    b = big.withColumn("__shard", (F.rand(seed=42) * salt).cast("int"))
    s = small.withColumn(
        "__shard", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return b.join(s, on + ["__shard"], how).drop("__shard")


def two_phase_count(df: DataFrame, key: str, salt: int = DEFAULT_SALT) -> DataFrame:
    """COUNT per key with an explicit two-phase (salted) plan: first
    aggregate (key, shard), then aggregate key — the hot key's rows
    never converge on a single reducer with unbounded input."""
    return (
        df.withColumn("__shard", (F.rand(seed=42) * salt).cast("int"))
        .groupBy(key, "__shard")
        .agg(F.count(F.lit(1)).alias("__partial"))
        .groupBy(key)
        .agg(F.sum("__partial").alias("n"))
    )


def distributed_ntile(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tie_col: str,
    n_buckets: int,
    bucket_col: str = "bucket",
    max_hist_rows: int = 1_000_000,
    materialize_input: bool | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (PARTITION BY group ORDER BY value, tie)``
    WITHOUT a per-group total sort.

    The naive window funnels each group's ENTIRE row set through one
    task — on a corpus where one group dominates (CCNet's per-language
    terciles: ~45% of web text is English) that is a single-reducer
    sort over billions of rows, the canonical skewed-key scale-killer.

    Equivalent skew-free plan, exact for any integral/discrete
    ``value_col``:

    1. histogram ``(group, value) -> count`` — one partial-aggregable
       groupBy; its size is bounded by |groups| x |distinct values|
       (the VALUE RANGE, e.g. centinat-rounded scores, not corpus
       size), so it collects to the driver and broadcasts back;
    2. per (group, value): ``offset`` = rows strictly below, ``n`` =
       group total — cumulative sums over the tiny histogram;
    3. within-(group, value) rank by ``tie_col`` — a window whose
       partition key is (group, value): thousands of small partitions
       instead of one giant one, no straggler;
    4. global rank r = offset + within-rank, then NTILE's exact
       distribution: with ``q = n div k`` and ``rem = n mod k``, the
       first ``rem`` buckets hold ``q+1`` rows and the rest ``q``
       (NTILE front-loads ALL remainder rows — NOT the same as the
       equi-fraction ``floor((r-1)k/n)`` split).

    The histogram collect is driver-bounded ONLY when ``value_col`` is
    discretized (the caller's contract): ``max_hist_rows`` guards it —
    a raw continuous score would make the histogram the size of the
    corpus, a driver OOM presenting as a mystery.  The guard counts
    first (one extra cheap agg) and fails loudly with the fix.

    ``materialize_input`` bounds the recompute-vs-storage trade: True
    stores the input projection once (localCheckpoint) and runs both
    passes from it, False evaluates the input DAG twice, None (default)
    reads env ``SPARK_GRAFT_NTILE_MATERIALIZE`` (default on).  Output
    is identical either way.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    # The input is evaluated twice — histogram pass here, rank pass in
    # the returned plan.  When df is the tail of an expensive DAG (the
    # perplexity scorer: 4 aggregations over a token stream) that
    # doubles the dominant cost, so materialize the narrow (group,
    # value, tie) projection once to executor block storage and run
    # both passes from it; blocks are freed by the ContextCleaner when
    # the result is dropped (same posture as perplexity_scores' token
    # stream).  Lazy (eager=False): constructing the result DataFrame
    # stays job-free, the histogram action below materializes it.
    #
    # RECOMPUTE-vs-STORAGE KNOB (VERDICT r15 #3): the checkpoint writes
    # the ENTIRE input projection to executor block storage, and
    # localCheckpoint blocks are non-replicated — on a 100 TB input
    # that is a full-corpus materialization whose loss (executor death
    # after lineage truncation) fails the job instead of recomputing.
    # ``materialize_input=False`` (or env SPARK_GRAFT_NTILE_MATERIALIZE=0
    # when the caller leaves it None) keeps the classic
    # evaluate-twice/recompute-on-failure posture instead; results are
    # identical either way (tests/test_skew_utils.py pins both paths).
    # The local default stays ON: at bench scale the input DAG is the
    # dominant cost and storing it is the measured win (guide §1.2).
    if materialize_input is None:
        materialize_input = (
            os.environ.get("SPARK_GRAFT_NTILE_MATERIALIZE", "1") != "0"
        )
    if materialize_input:
        df = df.localCheckpoint(eager=False)
    hist = (
        df.groupBy(group_col, value_col)
        .agg(F.count(F.lit(1)).alias("__c"))
        .limit(max_hist_rows + 1)  # bounds the collect, one extra row flags overflow
        .collect()
    )
    if len(hist) > max_hist_rows:
        raise ValueError(
            f"distributed_ntile: (group, value) histogram exceeds "
            f"{max_hist_rows} rows and would not be driver-bounded. "
            f"value_col={value_col!r} must be DISCRETIZED before calling "
            "(e.g. round a continuous score to fixed precision, as the "
            "CCNet centinat bucketing does)"
        )
    hist.sort(key=lambda r: (r[group_col], r[value_col]))
    rows, run, cur = [], 0, None
    totals: dict = {}
    for r in hist:
        if r[group_col] != cur:
            cur, run = r[group_col], 0
        rows.append((r[group_col], r[value_col], run))
        run += r["__c"]
        totals[r[group_col]] = run
    typ = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    offsets = spark.createDataFrame(
        [(g, v, off, totals[g]) for g, v, off in rows],
        f"{group_col} {typ[group_col]}, {value_col} {typ[value_col]}, "
        "__off long, __n long",
    )
    w = Window.partitionBy(group_col, value_col).orderBy(tie_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .join(F.broadcast(offsets), [group_col, value_col])
        .withColumn(
            bucket_col,
            F.expr(
                f"""CAST(CASE
                  WHEN (__off + __rn)
                       <= (__n % {int(n_buckets)})
                          * (__n DIV {int(n_buckets)} + 1)
                  THEN (__off + __rn - 1)
                       DIV (__n DIV {int(n_buckets)} + 1) + 1
                  ELSE (__n % {int(n_buckets)})
                       + (__off + __rn
                          - (__n % {int(n_buckets)})
                            * (__n DIV {int(n_buckets)} + 1) - 1)
                         DIV (__n DIV {int(n_buckets)}) + 1
                END AS LONG)"""
            ),
        )
        .drop("__rn", "__off", "__n")
    )
