"""Scan/commit metrics reports (reference core/.../metrics/ScanReport.java,
CommitReport.java, InMemoryMetricsReporter.java, MetricsReporter SPI).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table import reporting as RPT


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


@pytest.fixture()
def reporter(catalog):
    r = RPT.InMemoryMetricsReporter()
    RPT.register_metrics_reporter(catalog.warehouse, r)
    yield r
    RPT.unregister_metrics_reporter(r)


def _seed(spark, catalog, name="rpt_t"):
    t = catalog.create_table(name, "id BIGINT, grp BIGINT")
    df = spark.range(400).select(
        F.col("id"), F.floor(F.col("id") / 100).alias("grp")
    )
    for g in range(4):
        t.append(df.filter(F.col("grp") == g).coalesce(1))
    return t


def test_commit_report_per_append(spark, catalog, reporter):
    t = _seed(spark, catalog)
    crs = reporter.commit_reports()
    assert len(crs) == 4
    assert all(c.operation == "append" for c in crs)
    assert all(c.added_records == 100 for c in crs)
    assert [c.total_records for c in crs] == [100, 200, 300, 400]
    assert crs[-1].total_data_files == 4
    assert crs[-1].removed_data_files == 0


def test_scan_report_counts_pruned_files(spark, catalog, reporter):
    t = _seed(spark, catalog, name="rpt_scan")
    reporter.reports.clear()
    scan = t.scan(where=E.eq("id", 5))  # one file holds id=5
    files = scan.files()
    srs = reporter.scan_reports()
    assert len(srs) == 1
    sr = srs[0]
    # fast appends leave 4 delta manifests; per-manifest bounds prune 3
    # of them before any file-level eval (manifest-list pruning), so the
    # file accounting covers only the scanned manifest
    assert sr.skipped_data_manifests == 3
    assert sr.scanned_data_manifests == 1
    assert sr.total_data_files == 1
    assert sr.result_data_files == len(files) == 1
    assert sr.result_data_files + sr.skipped_data_files == sr.total_data_files
    assert sr.planning_duration_ms >= 0
    assert sr.result_file_size_bytes > 0
    # plan caching: second files() call emits no second report
    scan.files()
    assert len(reporter.scan_reports()) == 1


def test_scan_report_manifest_skip(spark, catalog, reporter):
    t = _seed(spark, catalog, name="rpt_mskip")
    reporter.reports.clear()
    t.scan(where=E.gt("id", 10**9)).files()
    srs = reporter.scan_reports()
    assert len(srs) == 1
    # whole-snapshot bounds skip: all 4 delta manifests skipped unread
    assert srs[0].skipped_data_manifests == 4
    assert srs[0].result_data_files == 0


def test_delete_commit_report(spark, catalog, reporter):
    t = _seed(spark, catalog, name="rpt_del")
    reporter.reports.clear()
    t.delete(E.eq("grp", 2))  # metadata-only: one whole file dropped
    crs = reporter.commit_reports()
    assert len(crs) == 1
    c = crs[0]
    assert c.operation == "delete"
    assert c.removed_data_files == 1
    assert c.removed_records == 100
    assert c.total_records == 300
    # MoR delete adds a delete file
    t.delete(E.eq("id", 7), mode="merge-on-read")
    assert reporter.commit_reports()[-1].added_delete_files == 1


def test_reporter_errors_never_fail_query(spark, catalog):
    class Boom(RPT.MetricsReporter):
        def report(self, rpt):
            raise RuntimeError("boom")

    b = Boom()
    RPT.register_metrics_reporter(catalog.warehouse, b)
    try:
        t = _seed(spark, catalog, name="rpt_boom")
        assert t.scan(where=E.eq("id", 1)).to_df().count() == 1
    finally:
        RPT.unregister_metrics_reporter(b)


def test_snapshot_summary_counters(spark, catalog):
    """SnapshotSummary.java parity: standard counter properties ride in
    each snapshot's summary."""
    t = _seed(spark, catalog, name="rpt_summary")
    s = t.current_snapshot().summary
    assert s["added-data-files"] == 1
    assert s["added-records"] == 100
    assert s["total-records"] == 400
    assert s["total-data-files"] == 4
    t.delete(E.eq("grp", 1))  # metadata-only drop of one file
    s2 = t.current_snapshot().summary
    assert s2["deleted-data-files"] == 1
    assert s2["deleted-records"] == 100
    assert s2["total-records"] == 300
