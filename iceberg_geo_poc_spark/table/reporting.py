"""Metrics reporting: scan and commit reports through a pluggable reporter.

Reference parity: ``api/.../metrics/MetricsReporter.java`` (SPI),
``core/src/main/java/org/apache/iceberg/metrics/ScanReport.java`` /
``CommitReport.java`` / ``InMemoryMetricsReporter.java`` /
``LoggingMetricsReporter.java``.  Every scan plan emits a ScanReport
(planning duration, result vs skipped data files, manifest-level skips,
result file size) and every successful commit emits a CommitReport
(added/removed files and records, delete files, total snapshot size) —
the observability surface operators use to find unpruned scans and
runaway commits at warehouse scale.

Reporters are registered per table-location prefix (the catalog-level
``metrics-reporter-impl`` configuration shape), default logging reporter
at DEBUG level.  Reporting must never fail the query: reporter errors
are swallowed (reference MetricsReporters.java behavior).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

log = logging.getLogger(__name__)


@dataclass
class ScanReport:
    table_location: str
    snapshot_id: int | None
    filter_desc: str | None
    planning_duration_ms: float
    total_data_files: int
    result_data_files: int
    skipped_data_files: int
    result_delete_files: int = 0
    skipped_data_manifests: int = 0  # 1 when snapshot-bounds pruned whole manifest
    scanned_data_manifests: int = 0
    result_file_size_bytes: int = 0
    distributed_planning: bool = False
    metadata: dict = field(default_factory=dict)


@dataclass
class CommitReport:
    table_location: str
    snapshot_id: int
    sequence_number: int
    operation: str
    added_data_files: int
    removed_data_files: int
    added_records: int
    removed_records: int
    added_delete_files: int
    total_data_files: int
    total_records: int
    attempts: int = 1
    metadata: dict = field(default_factory=dict)


class MetricsReporter:
    def report(self, rpt) -> None:  # ScanReport | CommitReport
        raise NotImplementedError


class LoggingMetricsReporter(MetricsReporter):
    def report(self, rpt) -> None:
        log.debug("%s", rpt)


class InMemoryMetricsReporter(MetricsReporter):
    """Collects reports for inspection (reference InMemoryMetricsReporter)."""

    def __init__(self):
        self.reports: list = []

    def report(self, rpt) -> None:
        self.reports.append(rpt)

    def scan_reports(self) -> list[ScanReport]:
        return [r for r in self.reports if isinstance(r, ScanReport)]

    def commit_reports(self) -> list[CommitReport]:
        return [r for r in self.reports if isinstance(r, CommitReport)]


_DEFAULT = LoggingMetricsReporter()
_REPORTERS: list[tuple[str, MetricsReporter]] = []


def register_metrics_reporter(
    location_prefix: str, reporter: MetricsReporter
) -> None:
    """Route reports for tables under ``location_prefix`` to ``reporter``
    (longest prefix wins; default logs at DEBUG)."""
    _REPORTERS.insert(0, (location_prefix, reporter))
    _REPORTERS.sort(key=lambda kv: -len(kv[0]))


def unregister_metrics_reporter(reporter: MetricsReporter) -> None:
    _REPORTERS[:] = [(p, r) for p, r in _REPORTERS if r is not reporter]


def report(table_location: str, rpt) -> None:
    """Deliver to the matching reporter; NEVER raises (reporting must not
    fail the query — reference MetricsReporters error handling)."""
    target = _DEFAULT
    for prefix, r in _REPORTERS:
        if table_location.startswith(prefix):
            target = r
            break
    try:
        target.report(rpt)
    except Exception:  # noqa: BLE001 — observability must not break queries
        log.exception("metrics reporter failed")
