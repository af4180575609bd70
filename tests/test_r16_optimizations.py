"""Round-16 optimization regressions: the gated input spread
(dedup._spread_for_head), the permutation-major minhash signature
kernel (bit-equality with the naive grid), and distributed_ntile's
recompute-vs-storage knob."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"w{i % 7} common tokens here plus doc specific "
            f"tail t{i} u{i * 3} v{i * 5} extra words for shingles")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spread_fires_on_underpartitioned_input(spark, docs):
    """A 1..few-partition input (the single-file table shape) gets the
    deterministic pmod(xxhash64) spread: output partitions =
    defaultParallelism, plan carries the hash exchange."""
    from iceberg_geo_poc_spark.operators.dedup import _spread_for_head

    n = spark.sparkContext.defaultParallelism
    one = docs.coalesce(1)
    spread = _spread_for_head(one)
    assert spread is not one
    assert spread.rdd.getNumPartitions() == n
    plan = _plan(spread)
    # (probing .rdd above finalized AQE, so the exchange may print as a
    # materialized ShuffleQueryStage rather than a bare Exchange node)
    assert "pmod" in plan, plan
    assert "Exchange" in plan or "ShuffleQueryStage" in plan, plan


def test_spread_skipped_on_well_partitioned_input(spark, docs):
    """An input that already carries >= defaultParallelism partitions
    (the multi-file table at scale) is returned UNCHANGED — no added
    exchange shuffling the raw text (VERDICT r15 #2)."""
    from iceberg_geo_poc_spark.operators.dedup import _spread_for_head

    n = spark.sparkContext.defaultParallelism
    import tempfile

    path = tempfile.mkdtemp(prefix="igps_spread_gate_")
    docs.repartition(n * 2).write.mode("overwrite").parquet(path)
    wide = spark.read.parquet(path)
    if wide.rdd.getNumPartitions() < n:
        pytest.skip("test files coalesced below defaultParallelism")
    spread = _spread_for_head(wide)
    assert spread is wide  # identity: zero plan change, zero exchange


def test_spread_kept_for_exchange_bearing_input(spark, docs):
    """An input that is not a plain narrow scan (here: an exchange-
    bearing repartition) is not size-estimated — it keeps the spread
    (status quo)."""
    from iceberg_geo_poc_spark.operators.dedup import _spread_for_head

    shuffled = docs.repartition(2, "doc_id")
    spread = _spread_for_head(shuffled)
    assert spread is not shuffled
    assert "pmod" in _plan(spread)


def test_minhash_results_identical_across_input_partitioning(spark, docs):
    """The gate is physical only: pairs from a 1-partition input equal
    pairs from a pre-spread input."""
    from iceberg_geo_poc_spark.operators.dedup import minhash_lsh_pairs

    # near-dup pair: two docs with identical text
    extra = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta iota"),
         (101, "alpha beta gamma delta epsilon zeta eta theta iota")],
        "doc_id long, text string",
    )
    base = docs.union(extra)
    n = spark.sparkContext.defaultParallelism
    got_one = sorted(
        (r["ia"], r["ib"], r["jaccard"])
        for r in minhash_lsh_pairs(base.coalesce(1)).collect()
    )
    got_wide = sorted(
        (r["ia"], r["ib"], r["jaccard"])
        for r in minhash_lsh_pairs(base.repartition(n * 2)).collect()
    )
    assert got_one == got_wide
    assert (100, 101, 1.0) in got_one


def test_sig_kernel_bit_identical_to_naive_grid(spark):
    """The permutation-major reduceat kernel must reproduce the naive
    doc-major grid exactly, including empty-shingle docs (bit-for-bit:
    the DuckDB oracle replays this arithmetic)."""
    from iceberg_geo_poc_spark.operators.dedup import (
        NUM_PERM,
        _doc_shingles,
        minhash_signatures,
    )
    from iceberg_geo_poc_spark.operators.hashing import (
        MERSENNE_P,
        minhash_coeffs,
        spark_hash60,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        n_words = int(rng.integers(0, 40))  # includes <3-word (empty) docs
        words = [f"t{int(rng.integers(0, 50))}" for _ in range(n_words)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = _doc_shingles(docs)
    got = {
        r["doc_id"]: (list(r["sig"]), list(r["sh_hash"]))
        for r in minhash_signatures(sh)
        .withColumn(
            "sh_hash",
            F.expr(
                "transform(shingles, s -> "
                + spark_hash60("s")
                + f" % CAST({MERSENNE_P} AS BIGINT))"
            ),
        )
        .collect()
    }
    coeffs = minhash_coeffs(NUM_PERM)
    a_vec = np.array([a for a, _ in coeffs], dtype=np.uint64)
    b_vec = np.array([b for _, b in coeffs], dtype=np.uint64)
    p = np.uint64(MERSENNE_P)
    n_empty = 0
    for doc_id, (sig, sh_hash) in got.items():
        x = np.asarray(sh_hash, dtype=np.uint64)
        if len(x) == 0:
            assert sig == []
            n_empty += 1
            continue
        grid = (x[:, None] * a_vec[None, :] + b_vec[None, :]) % p
        expect = grid.min(axis=0).astype(np.int64)
        assert sig == expect.tolist(), doc_id
    assert n_empty > 0  # the distribution really exercised the edge


def test_ntile_knob_paths_identical(spark):
    """materialize_input True/False give identical buckets; False keeps
    the input DAG in the public plan (no checkpoint scan)."""
    from iceberg_geo_poc_spark.operators.skew import distributed_ntile

    # spark.range input: its Range leaf is recognizable in the plan, so
    # the two postures are distinguishable (the broadcast offsets frame
    # is a createDataFrame/ExistingRDD in BOTH plans)
    df = spark.range(277).select(
        F.when(F.col("id") < 200, F.lit("g1")).otherwise(F.lit("g2")).alias("g"),
        F.when(F.col("id") < 200, (F.col("id") * 7) % 23)
        .otherwise(F.col("id") % 5)
        .alias("v"),
        F.col("id").alias("tie"),
    )
    on_df = distributed_ntile(df, "g", "v", "tie", 3, materialize_input=True)
    on = sorted((r["g"], r["tie"], r["bucket"]) for r in on_df.collect())
    off_df = distributed_ntile(df, "g", "v", "tie", 3, materialize_input=False)
    off = sorted((r["g"], r["tie"], r["bucket"]) for r in off_df.collect())
    assert on == off
    # knob off: the input DAG (Range leaf) stays in the public plan —
    # the classic recompute posture, nothing materialized
    assert "Range" in _plan(off_df)
    # knob on (the local default): the rank pass reads the checkpointed
    # blocks, the input DAG is gone from the plan
    assert "Range" not in _plan(on_df)
