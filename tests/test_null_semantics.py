"""SQL three-valued-logic safety for row-level ops.

A row whose predicate evaluates to NULL matches neither ``p`` nor
``NOT p``; DELETE WHERE p must leave it untouched.  The reference gets
this through Spark's own ReplaceData rewrite (null-safe condition
inversion); this engine's CoW rewrite must do the same explicitly
because ``Expr.negate()`` is a tree negation, not a row-set complement.

Regression for a confirmed silent row-loss defect: ``DELETE WHERE
v != 10`` on a file mixing NULL and matching rows dropped the NULL row.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from iceberg_geo_poc_spark.table import expressions as E
from iceberg_geo_poc_spark.table import manifest as M
from iceberg_geo_poc_spark.table import vector_eval as V
from iceberg_geo_poc_spark.table.catalog import Catalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


def _one_file_table(catalog, spark, name, rows="k bigint, v bigint"):
    t = catalog.create_table(name, rows)
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], rows
    ).coalesce(1)
    t.append(df)
    assert len(t._entries()) == 1, "repro needs nulls and matches in ONE file"
    return t


def test_cow_delete_ne_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_del")
    t.delete(E.ne("v", 10))
    # SQL: NULL != 10 is NULL -> row 2 does not match the delete
    assert sorted(r.k for r in t.to_df().collect()) == [1, 2]


def test_cow_delete_not_in_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_del_notin")
    t.delete(E.not_in("v", [10, 30]))
    # nothing matches: v in {10,30} or NULL
    assert sorted(r.k for r in t.to_df().collect()) == [1, 2, 3]


def test_mor_delete_ne_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_mor")
    t.delete(E.ne("v", 10), mode="merge-on-read")
    assert sorted(r.k for r in t.to_df().collect()) == [1, 2]


def test_overwrite_by_filter_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_ow")
    repl = spark.createDataFrame([(30, 300)], "k bigint, v bigint")
    t.overwrite(repl, where=E.ge("v", 30))
    assert sorted((r.k, r.v) for r in t.to_df().collect()) == [
        (1, 10),
        (2, None),
        (30, 300),
    ]


def test_transaction_delete_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_txn")
    t.new_transaction().delete(E.ne("v", 10)).commit()
    assert sorted(r.k for r in t.to_df().collect()) == [1, 2]


def test_update_where_ne_keeps_null_rows(spark, catalog):
    t = _one_file_table(catalog, spark, "t_upd")
    t.update({"v": 99}, E.ne("v", 10))
    assert sorted((r.k, r.v) for r in t.to_df().collect()) == [
        (1, 10),
        (2, None),
        (3, 99),
    ]


# -- strict evaluator semantics --------------------------------------------


def _stats(lo, hi, nulls, record_count=4):
    return E.FileStats(
        record_count=record_count,
        lower={"v": lo},
        upper={"v": hi},
        nulls={"v": nulls},
        bbox={},
    )


def test_strict_ne_all_null_file_does_not_match():
    # NULL != 5 is NULL under Spark SQL: an all-null file must not claim
    # a strict match (the reference's Java semantics differ; documented
    # divergence in expressions.py)
    s = E.FileStats(record_count=4, lower={}, upper={}, nulls={"v": 4}, bbox={})
    assert E.ne("v", 5).all_rows_match_file(s) is False
    # and with bounds present but all-null counts
    assert not E.ne("v", 5).all_rows_match_file(_stats(7, 7, 4))


def test_strict_ne_null_free_outside_bounds_matches():
    assert E.ne("v", 5).all_rows_match_file(_stats(7, 9, 0))
    assert not E.ne("v", 8).all_rows_match_file(_stats(7, 9, 0))


def test_strict_not_requires_null_free_for_three_valued_child():
    # NOT(v = 5): no row might match eq -> every NON-NULL row matches the
    # complement, but a NULL row matches neither
    inner = E.Predicate("eq", "v", 5)
    with_nulls = _stats(7, 9, 1)
    no_nulls = _stats(7, 9, 0)
    assert E.Not(inner).all_rows_match_file(no_nulls)
    assert not E.Not(inner).all_rows_match_file(with_nulls)


def test_strict_not_vector_parity():
    entries = M.entries_dataframe(
        [
            {
                "content": "data",
                "file_path": f"f{i}",
                "file_size": 1,
                "record_count": 4,
                "sequence_number": 1,
                "snapshot_id": 0,
                "partition": "{}",
                "lower": '{"v": 7}',
                "upper": '{"v": 9}',
                "nulls": '{"v": %d}' % n,
                "bbox": "{}",
            }
            for i, n in enumerate([0, 1, 4])
        ]
    )
    sv = V.StatsView(entries)
    expr = E.Not(E.Predicate("eq", "v", 5))
    vec = V.all_match(expr, sv)
    scalar = np.array(
        [expr.all_rows_match_file(M.file_stats_of(r)) for r in entries.itertuples()]
    )
    assert (vec == scalar).all()
    assert list(vec) == [True, False, False]


def test_strict_ne_vector_parity_all_null():
    entries = M.entries_dataframe(
        [
            {
                "content": "data",
                "file_path": "f0",
                "file_size": 1,
                "record_count": 3,
                "sequence_number": 1,
                "snapshot_id": 0,
                "partition": "{}",
                "lower": '{"v": 7}',
                "upper": '{"v": 7}',
                "nulls": '{"v": 3}',
                "bbox": "{}",
            }
        ]
    )
    sv = V.StatsView(entries)
    expr = E.ne("v", 5)
    assert not V.all_match(expr, sv)[0]
    assert not expr.all_rows_match_file(M.file_stats_of(next(entries.itertuples())))
