"""Deletion vectors: roaring codec correctness + table integration.

The codec tests pin the PUBLIC portable Roaring layout
(RoaringFormatSpec) with hand-computed golden bytes — not just
self-round-trips — so a mirrored encoder/decoder misconception cannot
pass.  The table tests prove the DV read path is exactly equivalent to
the position-delete parquet path it replaces, across conversion,
merge-on-reconvert, metadata tables, and the stats fast-path refusal.
"""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest
import pyspark.sql.functions as F

from iceberg_geo_poc_spark.table import Catalog, E
from iceberg_geo_poc_spark.table import deletion_vectors as DV
from iceberg_geo_poc_spark.table import maintenance as MAINT
from iceberg_geo_poc_spark.table import metadata_tables as MT


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(str(tmp_path / "warehouse"), spark)


# -- codec -------------------------------------------------------------------


def test_roaring32_golden_array_container():
    """Spec-derived golden: values {0, 2, 65536} -> two containers.

    Layout (all LE): cookie 12346 (u32) | count=2 (u32) |
    desc: (key=0, card-1=1), (key=1, card-1=0) |
    offsets: 24, 28 | payload: [0, 2] as u16, [0] as u16.
    """
    blob = DV._serialize_roaring32(np.array([0, 2, 65536], dtype=np.uint32))
    want = (
        struct.pack("<II", 12346, 2)
        + struct.pack("<HH", 0, 1)
        + struct.pack("<HH", 1, 0)
        + struct.pack("<II", 24, 28)
        + struct.pack("<HH", 0, 2)
        + struct.pack("<H", 0)
    )
    assert blob == want
    vals, used = DV._deserialize_roaring32(want)
    assert used == len(want)
    assert vals.tolist() == [0, 2, 65536]


def test_roaring32_bitmap_container_threshold():
    """Cardinality 4096 stays an array container; 4097 becomes the
    8 KiB bitset — the spec's exact crossover."""
    arr = DV._serialize_roaring32(np.arange(4096, dtype=np.uint32))
    assert len(arr) == 8 + 4 + 4 + 4096 * 2
    bmp = DV._serialize_roaring32(np.arange(4097, dtype=np.uint32))
    assert len(bmp) == 8 + 4 + 4 + 8192
    for blob in (arr, bmp):
        vals, _ = DV._deserialize_roaring32(blob)
        n = 4096 if blob is arr else 4097
        assert np.array_equal(vals, np.arange(n, dtype=np.uint32))


def test_roaring_run_container_cookie_rejected():
    bad = struct.pack("<II", 12347, 1)
    with pytest.raises(NotImplementedError):
        DV._deserialize_roaring32(bad)


def test_positions_64bit_roundtrip_fuzz():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=2**40),
            max_size=300,
        )
    )
    def check(vals):
        back = DV.deserialize_positions(DV.serialize_positions(vals))
        assert back.tolist() == sorted(set(vals))

    check()


def test_positions_reject_negative():
    with pytest.raises(ValueError):
        DV.serialize_positions([-1, 3])


def test_dv_file_blob_descriptors():
    data, descs = DV.write_dv_file(
        {"b.parquet": np.array([7, 9]), "a.parquet": np.array([0])}, 11, 3
    )
    # deterministic path order
    assert [d["referenced"] for d in descs] == ["a.parquet", "b.parquet"]
    for d in descs:
        got = DV.read_dv_blob(data, d["offset"], d["length"])
        want = [0] if d["referenced"] == "a.parquet" else [7, 9]
        assert got.tolist() == want
        assert d["cardinality"] == len(want)


# -- table integration -------------------------------------------------------


def _mk(spark, catalog, name="dvt", n=200):
    t = catalog.create_table(name, "a BIGINT, b STRING")
    t.append(
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(n)], "a BIGINT, b STRING"
        ).repartition(4)
    )
    return t


def test_convert_posdel_to_dv_preserves_results(spark, catalog):
    t = _mk(spark, catalog)
    t.delete(E.lt("a", 30), mode="merge-on-read")
    t.delete(E.ge("a", 190), mode="merge-on-read")
    before = sorted(r.a for r in t.to_df().collect())
    res = MAINT.convert_position_deletes_to_dvs(t)
    assert res["dv_blobs"] >= 1 and res["dv_file"] is not None
    ent = t._entries()
    assert (ent.content == "posdel").sum() == 0
    assert (ent.content == "dv").sum() == res["dv_blobs"]
    after = sorted(r.a for r in t.to_df().collect())
    assert after == before == list(range(30, 190))


def test_reconvert_merges_existing_dvs(spark, catalog):
    t = _mk(spark, catalog, "dvm")
    t.delete(E.lt("a", 10), mode="merge-on-read")
    MAINT.convert_position_deletes_to_dvs(t)
    # new posdel on top of the DV, then reconvert: one DV layer again
    t.delete(E.ge("a", 195), mode="merge-on-read")
    ent = t._entries()
    assert (ent.content == "dv").sum() >= 1
    assert (ent.content == "posdel").sum() >= 1
    assert sorted(r.a for r in t.to_df().collect()) == list(range(10, 195))
    res = MAINT.convert_position_deletes_to_dvs(t)
    ent = t._entries()
    assert (ent.content == "posdel").sum() == 0
    dv_ent = ent[ent.content == "dv"]
    # merged: every referenced file has exactly one DV
    refs = [json.loads(r.dv)["referenced"] for r in dv_ent.itertuples()]
    assert len(refs) == len(set(refs))
    assert sorted(r.a for r in t.to_df().collect()) == list(range(10, 195))
    # cardinality bookkeeping survives the merge
    assert int(dv_ent.record_count.sum()) == 15


def test_dv_metadata_tables_and_fastpath_refusal(spark, catalog):
    t = _mk(spark, catalog, "dvmeta")
    t.delete(E.lt("a", 5), mode="merge-on-read")
    MAINT.convert_position_deletes_to_dvs(t)
    del_files = MT.inspect(t, "delete_files")
    assert del_files.count() >= 1
    posdel = MT.inspect(t, "position_deletes").collect()
    assert len(posdel) == 5
    assert all(r.delete_file.endswith(".puffin") for r in posdel)
    # stats fast path must refuse: counts would be wrong under DVs
    from iceberg_geo_poc_spark.table import stats_agg

    assert stats_agg.try_stats_aggregate(t, ["count(*)"], None) is None


def test_dv_survives_maintenance_reachability(spark, catalog):
    """expire_snapshots and remove_orphan_files must treat the Puffin
    sidecar as reachable (it is referenced by a live dv entry)."""
    import os

    t = _mk(spark, catalog, "dvgc")
    t.delete(E.lt("a", 3), mode="merge-on-read")
    res = MAINT.convert_position_deletes_to_dvs(t)
    dv_path = res["dv_file"]
    assert os.path.exists(dv_path)
    MAINT.expire_snapshots(t, keep_last=1)
    MAINT.remove_orphan_files(t, older_than_ms=0)
    assert os.path.exists(dv_path)
    assert sorted(r.a for r in t.to_df().collect()) == list(range(3, 200))


def test_compaction_retires_dvs(spark, catalog):
    """Full compaction applies DV deletes into rewritten data files and
    drops the dv entries (same rule as posdel retirement)."""
    t = _mk(spark, catalog, "dvcomp")
    t.delete(E.lt("a", 50), mode="merge-on-read")
    MAINT.convert_position_deletes_to_dvs(t)
    MAINT.rewrite_data_files(t, min_input_files=1)
    ent = t._entries()
    assert (ent.content == "dv").sum() == 0
    assert sorted(r.a for r in t.to_df().collect()) == list(range(50, 200))


def test_direct_dv_delete_mode(spark, catalog):
    """mode='merge-on-read-dv' writes DVs at delete time; a second DV
    delete on the same files MERGES (one blob per file survives, the
    superseded blob entry is dropped in the same commit)."""
    t = _mk(spark, catalog, "dvw")
    t.delete(E.lt("a", 20), mode="merge-on-read-dv")
    ent = t._entries()
    assert (ent.content == "posdel").sum() == 0
    n1 = int((ent.content == "dv").sum())
    assert n1 >= 1
    assert sorted(r.a for r in t.to_df().collect()) == list(range(20, 200))
    t.delete(E.ge("a", 190), mode="merge-on-read-dv")
    ent = t._entries()
    dv_ent = ent[ent.content == "dv"]
    refs = [json.loads(r.dv)["referenced"] for r in dv_ent.itertuples()]
    assert len(refs) == len(set(refs)), "one DV per data file after merge"
    assert int(dv_ent.record_count.sum()) == 30
    assert sorted(r.a for r in t.to_df().collect()) == list(range(20, 190))


def test_dv_delete_then_posdel_stack(spark, catalog):
    """Mixing forms stays correct: DV delete followed by a classic
    posdel delete — the read path unions both layers."""
    t = _mk(spark, catalog, "dvmix")
    t.delete(E.lt("a", 10), mode="merge-on-read-dv")
    t.delete(E.ge("a", 195), mode="merge-on-read")
    ent = t._entries()
    assert (ent.content == "dv").sum() >= 1
    assert (ent.content == "posdel").sum() >= 1
    assert sorted(r.a for r in t.to_df().collect()) == list(range(10, 195))


def test_dv_decode_local_matches_distributed(spark, tmp_path):
    """The driver-side decode fast path (broadcast-bound scans) and the
    distributed mapInPandas decode are the same function of the same
    bytes — pin their equivalence."""
    rng = np.random.default_rng(7)
    dvs = {
        "x.parquet": np.unique(rng.integers(0, 1_000_000, 5000)),
        "y.parquet": np.unique(rng.integers(0, 2**40, 500)),
    }
    data, descs = DV.write_dv_file(dvs, 1, 1)
    p = str(tmp_path / "dv.puffin")
    with open(p, "wb") as f:
        f.write(data)
    quads = [(p, d["referenced"], d["offset"], d["length"]) for d in descs]
    got_local = sorted(
        map(tuple, DV.dv_deletes_local(spark, quads).collect())
    )
    got_dist = sorted(map(tuple, DV.dv_deletes_df(spark, quads).collect()))
    assert got_local == got_dist
    want = sorted(
        (f, int(v)) for f, arr in dvs.items() for v in arr
    )
    assert got_local == want
