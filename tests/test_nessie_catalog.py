"""NessieCatalog: catalog-level branches over a commit DAG (reference
nessie/NessieCatalog.java + NessieIcebergClient.java:586-700 —
commitMultipleOperations against an expected branch-head hash,
per-key conflict detection, NessieConflictException -> engine retry).

The load-bearing properties:
- every catalog mutation is one commit on a named reference;
- a stale writer conflicts ONLY if its keys changed (independent
  tables commit concurrently on one branch without false conflicts);
- branches fork the WHOLE catalog; commits on a branch leave main
  untouched; assign_ref is the publish (fast-forward);
- rename is ONE atomic Delete+Put commit."""

from __future__ import annotations

import threading

import pytest

from iceberg_geo_poc_spark.table import E
from iceberg_geo_poc_spark.table.nessie_catalog import (
    NessieCatalog,
    NessieConflict,
    NessieService,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return NessieCatalog(str(tmp_path / "wh"), spark)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"r{i}") for i in range(lo, hi)], "a BIGINT, b STRING"
    ).coalesce(1)


def test_create_load_append_roundtrip(spark, cat):
    t = cat.create_table("t1", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 10))
    t.append(_df(spark, 10, 20))
    assert cat.load_table("t1").to_df().count() == 20
    assert cat.table_exists("t1")
    assert cat.list_tables() == ["t1"]
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("t1", "a BIGINT")
    # every mutation is a commit on main: create + 2 appends
    assert len(cat.ref_log("main")) >= 3


def test_stale_handle_cas_retries(spark, cat):
    t1 = cat.create_table("t2", "a BIGINT, b STRING")
    t1.append(_df(spark, 0, 5))
    t2 = cat.load_table("t2")
    t1.append(_df(spark, 5, 10))  # advances the branch head
    t2.append(_df(spark, 10, 15))  # stale handle: conflicts once, retries
    assert cat.load_table("t2").to_df().count() == 15


def test_independent_tables_no_false_conflict(spark, cat):
    """Nessie's per-key conflict rule: a commit with a stale expected
    hash REBASES when its keys didn't change in between — concurrent
    commits to different tables both land without retry-looping."""
    cat.create_table("ta", "a BIGINT, b STRING")
    cat.create_table("tb", "a BIGINT, b STRING")
    head = cat.service.get_reference("main")["hash"]
    # two commits against the SAME (now stale for the second) hash on
    # DIFFERENT keys: both must succeed at the service level
    cat.service.commit(
        "main", head,
        {"default.ta": {"type": "ICEBERG_TABLE", "id": "x",
                        "metadataLocation": "/x/metadata/v9.metadata.json"}},
    )
    cat.service.commit(
        "main", head,  # stale, but touches only default.tb
        {"default.tb": {"type": "ICEBERG_TABLE", "id": "y",
                        "metadataLocation": "/y/metadata/v9.metadata.json"}},
    )
    with pytest.raises(NessieConflict):
        cat.service.commit(
            "main", head,  # stale AND touches default.ta -> conflict
            {"default.ta": None},
        )


def test_catalog_branch_isolation_and_publish(spark, cat):
    """Fork the catalog, commit on the branch, main untouched, publish
    via assign (fast-forward), drop the branch."""
    t = cat.create_table("t3", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 10))
    cat.create_ref("etl")
    cat.use_ref("etl")
    te = cat.load_table("t3")
    te.delete(E.lt("a", 5))
    te = cat.load_table("t3")
    te.append(_df(spark, 100, 103))
    assert cat.load_table("t3").to_df().count() == 8  # 5 kept + 3 new
    # main: untouched
    cat.use_ref("main")
    assert cat.load_table("t3").to_df().count() == 10
    # publish = fast-forward main to etl's head
    cat.assign_ref("main", to="etl")
    assert cat.load_table("t3").to_df().count() == 8
    cat.drop_ref("etl")
    with pytest.raises(KeyError):
        cat.use_ref("etl")


def test_divergent_branches_do_not_clobber(spark, cat):
    """Both branches advance the SAME table independently — uuid-named
    documents + per-ref pointers keep both lineages readable."""
    t = cat.create_table("t4", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 4))
    cat.create_ref("exp")
    # main: append 4..8
    cat.load_table("t4").append(_df(spark, 4, 8))
    # exp: delete a=0 (same next version number as main's append)
    cat.use_ref("exp")
    cat.load_table("t4").delete(E.eq("a", 0))
    assert cat.load_table("t4").to_df().count() == 3
    cat.use_ref("main")
    assert cat.load_table("t4").to_df().count() == 8
    # and exp still reads 3 after main advanced again
    cat.load_table("t4").append(_df(spark, 8, 10))
    cat.use_ref("exp")
    assert cat.load_table("t4").to_df().count() == 3


def test_atomic_rename_and_drop(spark, cat):
    t = cat.create_table("t5", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 3))
    before = len(cat.ref_log("main"))
    cat.rename_table("t5", "t5_renamed")
    assert len(cat.ref_log("main")) == before + 1  # ONE commit
    assert not cat.table_exists("t5")
    assert cat.load_table("t5_renamed").to_df().count() == 3
    # renamed table keeps its location; commits still arbitrate
    cat.load_table("t5_renamed").append(_df(spark, 3, 6))
    assert cat.load_table("t5_renamed").to_df().count() == 6
    cat.drop_table("t5_renamed")
    assert not cat.table_exists("t5_renamed")
    with pytest.raises(FileNotFoundError):
        cat.load_table("t5_renamed")


def test_namespaces_and_views_are_content(spark, cat):
    cat.create_namespace("marts", {"owner": "data-eng"})
    assert "marts" in cat.list_namespaces()
    assert cat.namespace_properties("marts")["owner"] == "data-eng"
    t = cat.create_table("marts.v_src", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 6))
    with pytest.raises(ValueError, match="not empty"):
        cat.drop_namespace("marts")
    cat.create_view("marts.small", "SELECT a FROM v_src WHERE a < 2")
    cat.create_view(
        "marts.small", "SELECT a FROM v_src WHERE a < 4", replace=True
    )
    assert cat.list_views() == ["marts.small"]
    assert len(cat.view_versions("marts.small")) == 2
    assert cat.load_view("marts.small").count() == 4
    assert cat.load_view("marts.small", version=0).count() == 2
    # views are branch-scoped content like everything else
    cat.create_ref("vb")
    cat.use_ref("vb")
    cat.drop_view("marts.small")
    assert cat.list_views() == []
    cat.use_ref("main")
    assert cat.list_views() == ["marts.small"]


def test_concurrent_appends_all_land(spark, cat):
    """8 threads x 1 append on ONE table: every commit lands exactly
    once through hash-CAS + engine retry.  Retry budget raised for the
    8-way contention (reference COMMIT_NUM_RETRIES tuning)."""
    t = cat.create_table(
        "t6", "a BIGINT, b STRING",
        properties={"commit.retry.num-retries": "30"},
    )
    t.append(_df(spark, 0, 1))
    errs = []

    def worker(i):
        try:
            cat.load_table("t6").append(_df(spark, 10 * i, 10 * i + 2))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(1, 9)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert cat.load_table("t6").to_df().count() == 1 + 8 * 2


def test_shared_service_two_catalogs(spark, tmp_path):
    """Two catalog clients over one service see each other's commits
    (the service is the single source of truth, like a real Nessie
    deployment with many engines attached)."""
    svc = NessieService()
    c1 = NessieCatalog(str(tmp_path / "wh1"), spark, service=svc)
    t = c1.create_table("shared", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 4))
    c2 = NessieCatalog(str(tmp_path / "wh1"), spark, service=svc)
    assert c2.load_table("shared").to_df().count() == 4
    c2.load_table("shared").append(_df(spark, 4, 6))
    assert c1.load_table("shared").to_df().count() == 6


def test_snapshot_table_zero_copy(spark, cat):
    t = cat.create_table("t7", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    clone = cat.snapshot_table("t7", "t7_clone")
    assert clone.to_df().count() == 5
    assert clone.meta.properties["gc.enabled"] == "false"
    # clone evolves independently
    clone.append(_df(spark, 5, 8))
    assert cat.load_table("t7_clone").to_df().count() == 8
    assert cat.load_table("t7").to_df().count() == 5


def test_register_table(spark, cat):
    t = cat.create_table("t8", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    ptr = cat.service.get_content("main", "default.t8")["metadataLocation"]
    reg = cat.register_table("t8_reg", ptr)
    assert reg.to_df().count() == 5
    with pytest.raises(ValueError, match="already exists"):
        cat.register_table("t8_reg", ptr)


def test_older_metadata_versions_remain_readable(spark, cat):
    """Documents are uuid-suffixed, so canonical v{N} names are never
    written — but a reader pinned to a PREVIOUS metadata version
    (static-table posture) must still resolve it via the backend
    (ADVICE r13: only the current version redirected)."""
    import json
    import os

    from iceberg_geo_poc_spark.table import metadata as MD

    t = cat.create_table("told", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 5))
    t.append(_df(spark, 5, 10))
    be = MD.backend_for(t.location)
    cur_v = t.meta.version
    assert cur_v >= 2
    for v in range(cur_v + 1):  # every version incl. 0
        p = os.path.join(t.location, "metadata", f"v{v}.metadata.json")
        assert be.exists(p), f"v{v} invisible"
        doc = json.loads(be.read(p))
        assert doc["location"] == t.location
    # beyond-current still 404s
    p = os.path.join(t.location, "metadata", f"v{cur_v + 1}.metadata.json")
    assert not be.exists(p)
    with pytest.raises(FileNotFoundError):
        be.read(p)


def test_divergent_branch_old_versions_resolve_per_ref(spark, tmp_path):
    """code-review r14: two branches advance the SAME table to the
    same version number with DIFFERENT documents; a reader pinned to
    an older version on one ref must get THAT ref's document (history
    walk), never the other branch's same-numbered file."""
    import json
    import os

    from iceberg_geo_poc_spark.table import metadata as MD
    from iceberg_geo_poc_spark.table.nessie_catalog import NessieCatalog

    cat = NessieCatalog(str(tmp_path / "whdv"), spark)
    t = cat.create_table("dvt", "a BIGINT, b STRING")
    t.append(_df(spark, 0, 3))  # v1 shared by both branches
    cat.create_ref("dev")
    # main advances to v2 with ITS document
    cat.use_ref("main")
    cat.load_table("dvt").append(_df(spark, 10, 13))
    main_v2_rows = 6
    # dev advances to v2 with a DIFFERENT document (different rows)
    cat.use_ref("dev")
    cat.load_table("dvt").append(_df(spark, 100, 105))
    dev_v2_rows = 8
    loc = t.location
    p_v2 = os.path.join(loc, "metadata", "v2.metadata.json")
    # reader on MAIN pinned to v2 sees main's snapshot
    cat.use_ref("main")
    be = MD.backend_for(loc)
    doc_main = json.loads(be.read(p_v2))
    # reader on DEV pinned to v2 sees dev's snapshot
    cat.use_ref("dev")
    doc_dev = json.loads(be.read(p_v2))
    assert doc_main != doc_dev
    # row counts via static loads of each pinned doc
    sm = MD.TableMetadata.from_json(doc_main, 2)
    sd = MD.TableMetadata.from_json(doc_dev, 2)
    from iceberg_geo_poc_spark.table.table import Table

    assert Table(sm, spark).to_df().count() == main_v2_rows
    assert Table(sd, spark).to_df().count() == dev_v2_rows
    # pre-rename versions still resolve after an atomic rename
    cat.use_ref("main")
    cat.rename_table("dvt", "dvt2")
    assert json.loads(be.read(p_v2)) == doc_main
