"""Session-level helpers: the driver-side parquet nanos probe."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_geo_poc_spark.session import _nanos_timestamp_cols


def _write_ns_file(path: str) -> None:
    tbl = pa.table(
        {
            "ts": pa.array([1, 2, 3], type=pa.timestamp("ns")),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    pq.write_table(tbl, path)


def test_nanos_probe_flat_dir(tmp_path):
    d = tmp_path / "flat"
    d.mkdir()
    _write_ns_file(str(d / "part-0.parquet"))
    assert _nanos_timestamp_cols(str(d)) == ("ts",)


def test_nanos_probe_hive_partitioned_dir(tmp_path):
    # no top-level part file — only partition subdirectories (the layout
    # that used to raise an uncaught StopIteration from next())
    d = tmp_path / "hive"
    sub = d / "dt=2024-01-01"
    sub.mkdir(parents=True)
    (d / "_SUCCESS").write_text("")
    _write_ns_file(str(sub / "part-0.parquet"))
    assert _nanos_timestamp_cols(str(d)) == ("ts",)


def test_nanos_probe_no_parquet_anywhere(tmp_path):
    d = tmp_path / "empty"
    d.mkdir()
    (d / "_SUCCESS").write_text("")
    os.makedirs(d / "sub")
    assert _nanos_timestamp_cols(str(d)) == ()
