"""DynamoDbLockManager: lease-based lock over the DynamoDB item store
(reference aws/dynamodb/DynamoDbLockManager.java:62-320), and its Glue
integration (reference GlueTableOperations.persistGlueTable: with a
LockManager the UpdateTable goes UNCONDITIONAL — the lock is the
arbitration; versionId preconditions engage only when lockManager is
null).

Load-bearing properties: first writer PutItems with
attribute_not_exists; a contender must wait out the holder's FULL
lease and only steals if the version DIDN'T rotate meanwhile (a live
heartbeat rotates it, so live holders never lose the lock); release is
owner-conditional (releasing someone else's lock fails instead of
clobbering)."""

from __future__ import annotations

import threading
import time

from iceberg_geo_poc_spark.table.dynamodb_catalog import (
    DynamoDbLockManager,
    DynamoService,
)


def _mgr(svc, **kw):
    defaults = dict(
        heartbeat_interval=0.03,
        heartbeat_timeout=0.15,
        acquire_timeout=3.0,
        acquire_interval=0.01,
    )
    defaults.update(kw)
    return DynamoDbLockManager(svc, **defaults)


def test_acquire_release_roundtrip():
    svc = DynamoService()
    m = _mgr(svc)
    assert m.acquire("db.t", "owner-a")
    assert svc.get_item("db.t", "__lock__")["lockOwnerId"] == "owner-a"
    assert m.release("db.t", "owner-a")
    assert svc.get_item("db.t", "__lock__") is None
    m.close()


def test_live_holder_never_loses_the_lock():
    """The contender waits a full lease, but the holder's heartbeat
    rotates the version during the wait — the steal's conditional
    PutItem must lose every time until release."""
    svc = DynamoService()
    holder = _mgr(svc)
    contender = _mgr(svc, acquire_timeout=0.5)
    assert holder.acquire("db.t", "holder")
    t0 = time.monotonic()
    assert not contender.acquire("db.t", "contender")
    assert time.monotonic() - t0 >= 0.4  # it really kept retrying
    assert svc.get_item("db.t", "__lock__")["lockOwnerId"] == "holder"
    holder.release("db.t", "holder")
    holder.close()
    contender.close()


def test_dead_holder_lease_expires_to_contender():
    """A holder whose heartbeats stopped (crash) loses the lock after
    ONE lease duration: the version never rotates, so the conditional
    steal lands."""
    svc = DynamoService()
    holder = _mgr(svc)
    assert holder.acquire("db.t", "dead")
    holder.close()  # kills the heartbeat WITHOUT releasing — a crash
    time.sleep(0.05)
    contender = _mgr(svc)
    assert contender.acquire("db.t", "alive")
    assert svc.get_item("db.t", "__lock__")["lockOwnerId"] == "alive"
    contender.release("db.t", "alive")
    contender.close()


def test_release_is_owner_conditional():
    svc = DynamoService()
    m = _mgr(svc)
    assert m.acquire("db.t", "owner-a")
    stranger = _mgr(svc)
    assert not stranger.release("db.t", "owner-b")
    assert svc.get_item("db.t", "__lock__")["lockOwnerId"] == "owner-a"
    assert m.release("db.t", "owner-a")
    m.close()
    stranger.close()


def test_independent_entities_do_not_serialize():
    svc = DynamoService()
    m = _mgr(svc)
    assert m.acquire("db.t1", "a")
    assert m.acquire("db.t2", "b")  # different entity: no wait
    m.release("db.t1", "a")
    m.release("db.t2", "b")
    m.close()


def test_contended_acquire_exactly_one_winner_at_a_time():
    svc = DynamoService()
    order: list[str] = []
    olock = threading.Lock()

    def worker(i):
        m = _mgr(svc, acquire_timeout=10.0)
        assert m.acquire("db.hot", f"w{i}")
        with olock:
            order.append(f"enter-w{i}")
        time.sleep(0.02)  # hold briefly
        with olock:
            order.append(f"exit-w{i}")
        m.release("db.hot", f"w{i}")
        m.close()

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # strict alternation: every enter is followed by its own exit
    # before the next enter (mutual exclusion held throughout)
    for j in range(0, len(order), 2):
        assert order[j].startswith("enter-")
        assert order[j + 1] == order[j].replace("enter-", "exit-")
    assert len(order) == 12


def test_wrong_owner_release_keeps_holder_heartbeat_alive():
    """release() with a WRONG owner_id must not stop the holder's
    heartbeat (the _beats map is keyed by entity only): the delete is
    owner-conditional and runs FIRST, so a failed release leaves the
    lease rotating and a contender still cannot steal it."""
    svc = DynamoService()
    holder = _mgr(svc)
    assert holder.acquire("db.t", "holder")
    assert not holder.release("db.t", "intruder")
    # the heartbeat must still be registered and rotating
    assert "db.t" in holder._beats
    v0 = svc.get_item("db.t", "__lock__")["v"]
    time.sleep(0.12)
    assert svc.get_item("db.t", "__lock__")["v"] != v0
    # a short-patience contender cannot steal the live lease
    contender = _mgr(svc, acquire_timeout=0.5)
    assert not contender.acquire("db.t", "contender")
    assert svc.get_item("db.t", "__lock__")["lockOwnerId"] == "holder"
    assert holder.release("db.t", "holder")
    holder.close()
    contender.close()
