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


# random predicate trees over (k, v): pruning + strict-elision must be
# invisible — scan(where) always equals filter-on-full-scan
def _leaf(draw):
    op = draw(
        st.sampled_from(
            ["ge", "le", "gt", "lt", "eq", "in", "is_null", "not_null",
             "is_nan", "not_nan"]
        )
    )
    col = draw(st.sampled_from(["k", "v"]))
    if op == "is_null":
        return E.is_null(col)
    if op == "not_null":
        return E.not_null(col)
    if op in ("is_nan", "not_nan"):
        # NaN tests bind only to the double column (like the reference,
        # which rejects isNaN on non-floating columns)
        return getattr(E, op)("v")
    if op == "in":
        vals = draw(st.lists(st.integers(-5, 15), min_size=1, max_size=4))
        return E.in_(col, [float(x) if col == "v" else x for x in vals])
    if col == "v" and draw(st.integers(0, 9)) == 0:
        v = float("nan")  # NaN literal: factories normalize it
    else:
        v = draw(st.integers(-5, 15))
        v = float(v) if col == "v" else v
    return {"ge": E.ge, "le": E.le, "gt": E.gt, "lt": E.lt, "eq": E.eq}[op](col, v)


@st.composite
def _pred(draw, depth=2):
    if depth == 0 or draw(st.booleans()):
        return _leaf(draw)
    kind = draw(st.sampled_from(["and", "or", "not"]))
    if kind == "not":
        return ~draw(_pred(depth=depth - 1))
    l = draw(_pred(depth=depth - 1))
    r = draw(_pred(depth=depth - 1))
    return (l & r) if kind == "and" else (l | r)


ROWS2 = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=-10, max_value=20)),
        st.one_of(
            st.none(),
            st.just(float("nan")),  # NaN distinct from NULL end-to-end
            st.integers(min_value=-10, max_value=20),
        ),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=ROWS2, pred=_pred())
def test_pruning_never_changes_results(spark, tmp_path_factory, rows, pred):
    cat = Catalog(str(tmp_path_factory.mktemp("wh")), spark)
    t = cat.create_table("pp", "k BIGINT, v DOUBLE")
    typed = [(k, float(v) if v is not None else None) for k, v in rows]
    third = max(1, len(typed) // 3)
    for i in range(0, len(typed), third):
        t.append(
            spark.createDataFrame(typed[i : i + third], "k BIGINT, v DOUBLE").coalesce(1)
        )
    full = spark.createDataFrame(typed, "k BIGINT, v DOUBLE")
    want = sorted(
        (str((r.k, r.v)) for r in full.filter(pred.to_spark_column()).collect()),
    )
    # stringified: tuple equality would treat (1, nan) != (1, nan)
    got = sorted(
        str((r.k, r.v)) for r in t.scan(where=pred).to_df().collect()
    )
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=ROWS2,
    pred=_pred(),
    del_keys=st.lists(st.integers(min_value=-10, max_value=20), max_size=3),
    modes=st.lists(st.sampled_from(["copy-on-write", "merge-on-read"]), max_size=3),
)
def test_interleaved_appends_deletes_roundtrip(
    spark, tmp_path_factory, rows, pred, del_keys, modes
):
    """Random interleaving of fast appends and CoW/MoR deletes (delta
    manifests, row-delta commits, consolidations) must equal a plain
    list model under both the full scan and a random pruned scan."""
    from iceberg_geo_poc_spark.table import E as EE

    cat = Catalog(str(tmp_path_factory.mktemp("wh")), spark)
    t = cat.create_table("mix", "k BIGINT, v DOUBLE")
    typed = [(k, float(v) if v is not None else None) for k, v in rows]
    model: list = []
    third = max(1, len(typed) // 3)
    chunks = [typed[i : i + third] for i in range(0, len(typed), third)]
    for i, chunk in enumerate(chunks):
        t.append(spark.createDataFrame(chunk, "k BIGINT, v DOUBLE").coalesce(1))
        model.extend(chunk)
        if i < len(del_keys):
            key = del_keys[i]
            mode = modes[i] if i < len(modes) else "copy-on-write"
            t.delete(EE.eq("k", key), mode=mode)
            model = [r for r in model if r[0] != key]
    full = spark.createDataFrame(model or [(None, None)], "k BIGINT, v DOUBLE")
    if not model:
        assert t.to_df().count() == 0
        return
    want = sorted(str((r.k, r.v)) for r in full.filter(pred.to_spark_column()).collect())
    got = sorted(str((r.k, r.v)) for r in t.scan(where=pred).to_df().collect())
    assert got == want
    assert t.to_df().count() == len(model)
