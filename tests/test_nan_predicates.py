"""IS_NAN / NOT_NAN predicates + nan_value_counts metrics, end-to-end.

Reference parity: isNaN/notNaN are part of the 18-op predicate surface
(api/.../expressions/Expressions.java:139-151); nan counts are
write-time metrics (api/.../Metrics.java nanValueCounts, accumulated by
FloatFieldMetrics.java) consumed by InclusiveMetricsEvaluator.java
:186-211 and StrictMetricsEvaluator.java:173-196 (canContainNaNs guard
:483-486).

NaN *ordering* follows this engine's row engine — Spark SQL and the
DuckDB oracle agree exactly (verified): NaN sorts greater than every
value and NaN = NaN is true.  So NaN rows match gt/ge/ne of a finite
literal and never match lt/le/eq/in — the evaluators (expressions.py,
vector_eval.py, spark_planning.py) implement that contract, which
diverges deliberately from the reference's Java semantics (there NaN
matches no literal predicate).

parquet-mr footers order doubles by Double.compareTo, so a Spark-written
file containing NaN has max=NaN — manifest._enc_stat records that bound
as missing and harvest_footer_stats turns it into an exact NaN-presence
hint that gates the distributed counting job.
"""

from __future__ import annotations

import math

import pytest

from iceberg_geo_poc_spark.table import expressions as E
from iceberg_geo_poc_spark.table.catalog import Catalog

NAN = float("nan")


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


@pytest.fixture()
def nan_table(catalog, spark):
    """Three files: clean, mixed-NaN, all-NaN."""
    t = catalog.create_table("nt", "k bigint, x double")
    ddl = "k bigint, x double"
    t.append(spark.createDataFrame([(1, 1.0), (2, 5.0)], ddl).coalesce(1))
    t.append(spark.createDataFrame([(3, 2.0), (4, NAN)], ddl).coalesce(1))
    t.append(spark.createDataFrame([(5, NAN), (6, NAN)], ddl).coalesce(1))
    assert len(t._entries()) == 3
    return t


def _scan(t, where):
    s = t.scan(where=where)
    return sorted(r.k for r in s.to_df().collect()), len(s.files())


def test_nan_counts_harvested(nan_table):
    import json

    counts = sorted(
        json.loads(s)["x"] for s in nan_table._entries()["nans"]
    )
    assert counts == [0, 1, 2]


def test_is_nan_scan_prunes_clean_file(nan_table):
    rows, files = _scan(nan_table, E.is_nan("x"))
    assert rows == [4, 5, 6]
    assert files == 2  # clean file pruned via nan_count == 0


def test_not_nan_scan_prunes_all_nan_file(nan_table):
    rows, files = _scan(nan_table, E.not_nan("x"))
    assert rows == [1, 2, 3]
    assert files == 2  # all-NaN file pruned via nans_only


def test_gt_keeps_nan_files(nan_table):
    # Spark: NaN > 3.0 is true — NaN rows must come back
    rows, files = _scan(nan_table, E.gt("x", 3.0))
    assert rows == [2, 4, 5, 6]
    assert files == 3


def test_lt_prunes_all_nan_file(nan_table):
    rows, files = _scan(nan_table, E.lt("x", 3.0))
    assert rows == [1, 3]
    assert files == 2


def test_nan_literal_normalization():
    assert E.eq("x", NAN) == E.Predicate("is_nan", "x")
    assert E.ne("x", NAN) == E.Predicate("not_nan", "x")
    assert isinstance(E.gt("x", NAN), E.AlwaysFalse)
    assert E.ge("x", NAN) == E.Predicate("is_nan", "x")
    assert E.le("x", NAN) == E.Predicate("not_null", "x")
    # lt NaN == "finite value": non-null and not NaN
    lt = E.lt("x", NAN)
    assert isinstance(lt, E.And)
    # in/not_in split the NaN member out
    in_ = E.in_("x", [1.0, NAN])
    assert isinstance(in_, E.Or)
    assert E.in_("x", [NAN]) == E.Predicate("is_nan", "x")
    ni = E.not_in("x", [1.0, NAN])
    assert isinstance(ni, E.And)


def test_eq_nan_literal_scan(nan_table):
    # x = NaN must behave exactly like is_nan (Spark: NaN = NaN is true)
    rows, files = _scan(nan_table, E.eq("x", NAN))
    assert rows == [4, 5, 6]
    assert files == 2


def test_row_residual_matches_spark_semantics(nan_table, spark):
    # whole-table residual check incl. NULL: NULL is "not NaN"
    t = nan_table
    t.append(spark.createDataFrame([(7, None)], "k bigint, x double").coalesce(1))
    rows, _ = _scan(t, E.not_nan("x"))
    assert rows == [1, 2, 3, 7]
    rows, _ = _scan(t, E.is_nan("x"))
    assert rows == [4, 5, 6]


def test_metadata_delete_lt_keeps_nan_rows(nan_table):
    # DELETE x < 10: NaN rows do NOT match (NaN sorts greatest) and the
    # strict evaluator must not let the mixed file be dropped wholesale
    nan_table.delete(E.lt("x", 10.0))
    assert sorted(r.k for r in nan_table.to_df().collect()) == [4, 5, 6]


def test_metadata_delete_gt_drops_all_nan_file(catalog, spark):
    t = catalog.create_table("t2", "k bigint, x double")
    t.append(spark.createDataFrame([(5, NAN), (6, NAN)], "k bigint, x double").coalesce(1))
    t.append(spark.createDataFrame([(1, 1.0)], "k bigint, x double").coalesce(1))
    plan = t._plan_cow(E.gt("x", 0.0))
    # all-NaN file strictly matches gt (every NaN row > 0.0 in Spark),
    # so both files drop metadata-only — no rewrite job
    assert len(plan["full"]) == 2 and not plan["partial"]
    t.delete(E.gt("x", 0.0))
    assert t.to_df().count() == 0


def test_strict_lt_refuses_nan_file():
    s = E.FileStats(
        record_count=4,
        lower={"x": 1.0},
        upper={"x": 9.0},
        nulls={"x": 0},
        bbox={},
        nans={"x": 1},
    )
    # bounds say hi < 10, but the NaN row fails x < 10
    assert not E.lt("x", 10.0).all_rows_match_file(s)
    assert E.gt("x", 0.0).all_rows_match_file(s)  # NaN row matches gt
    s.nans = {"x": 0}
    assert E.lt("x", 10.0).all_rows_match_file(s)


def test_incl_gt_keeps_file_with_poisoned_bounds():
    # parquet-mr max=NaN is recorded as missing upper; the nan count
    # alone must keep the file for gt
    s = E.FileStats(
        record_count=3,
        lower={"x": 1.0},
        upper={},
        nulls={"x": 0},
        bbox={},
        nans={"x": 1},
    )
    assert E.gt("x", 100.0).might_match_file(s)
    # and an all-NaN file never matches lt/le/eq/in
    s2 = E.FileStats(
        record_count=3, lower={}, upper={}, nulls={"x": 0}, bbox={}, nans={"x": 3}
    )
    assert not E.lt("x", 1e18).might_match_file(s2)
    assert not E.eq("x", 5.0).might_match_file(s2)
    assert E.ne("x", 5.0).might_match_file(s2)


def test_sql_where_isnan_prunes(catalog, spark, nan_table):
    # textual dispatcher: ISNAN(col) in WHERE drives file pruning
    got = catalog.sql("SELECT k FROM nt WHERE isnan(x)")
    assert sorted(r.k for r in got.collect()) == [4, 5, 6]
    got2 = catalog.sql("SELECT k FROM nt WHERE NOT isnan(x)")
    assert sorted(r.k for r in got2.collect()) == [1, 2, 3]


def test_footer_nan_hint_gates_counting_job(catalog, spark):
    # a NaN-free append must not need the counting job: the hint comes
    # back all-False from the footers
    from iceberg_geo_poc_spark.table import manifest as M

    t = catalog.create_table("t3", "k bigint, x double")
    t.append(spark.createDataFrame([(1, 1.0), (2, 2.0)], "k bigint, x double").coalesce(1))
    p = t._entries().iloc[0].file_path
    *_, hint = M.harvest_footer_stats(p)
    assert hint == {"x": False}
    t.append(spark.createDataFrame([(3, NAN)], "k bigint, x double").coalesce(1))
    ent = t._entries()
    p2 = [q for q in ent.file_path if q != p][0]
    *_, hint2 = M.harvest_footer_stats(p2)
    assert hint2 == {"x": True}


def test_orc_nan_counts(catalog, spark):
    import json

    t = catalog.create_table(
        "t_orc", "k bigint, x double", properties={"write.format.default": "orc"}
    )
    t.append(spark.createDataFrame([(1, 1.0), (2, NAN)], "k bigint, x double").coalesce(1))
    nans = [json.loads(s) for s in t._entries()["nans"]]
    assert sum(d.get("x", 0) for d in nans) == 1
    rows, _ = _scan(t, E.is_nan("x"))
    assert rows == [2]
