"""Property-based write→scan→read round-trips (the reference's
RandomGenericData/RandomData posture, SURVEY §5.4) via hypothesis."""

from __future__ import annotations

import math

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st

from iceberg_geo_poc_spark.table import Catalog, E

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.one_of(st.none(), st.text(max_size=20)),
        st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=64),
        ),
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS)
def test_append_scan_roundtrip_random(spark, tmp_path_factory, rows):
    cat = Catalog(str(tmp_path_factory.mktemp("wh")), spark)
    t = cat.create_table("rt", "k BIGINT, s STRING, v DOUBLE")
    df = spark.createDataFrame(rows, "k BIGINT, s STRING, v DOUBLE")
    t.append(df)
    got = sorted(
        ((r.k, r.s, r.v) for r in t.to_df().collect()),
        key=lambda x: (x[0], x[1] or "", x[2] if x[2] is not None else math.inf),
    )
    want = sorted(
        rows,
        key=lambda x: (x[0], x[1] or "", x[2] if x[2] is not None else math.inf),
    )
    assert got == want
    # stats pruning never loses rows (inclusive semantics, any predicate)
    ks = [r[0] for r in rows]
    mid = sorted(ks)[len(ks) // 2]
    scan = t.scan(where=E.ge("k", mid))
    assert sorted(r.k for r in scan.to_df().collect()) == sorted(
        k for k in ks if k >= mid
    )
