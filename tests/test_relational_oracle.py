"""Every registered SQL-expressible query must match its DuckDB oracle.

This replicates the driver's t2 gate locally (at a smaller SF by default;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the full check).
"""

from __future__ import annotations

import pytest

from iceberg_geo_poc_spark.registry import all_queries

from tests.oracle_harness import run_and_compare


@pytest.mark.parametrize("name", sorted(all_queries().keys()))
def test_oracle_parity(spark, sf_dir, name):
    run_and_compare(spark, sf_dir, name)
