"""Commit-protocol backend (lake/metastore.py): the version-reservation
race against both the POSIX backend and the in-memory conditional-PUT
fake, plus LakeTable running entirely on the fake store."""

import threading

import pytest

from etl_spark.lake.metastore import (
    ConcurrentCommitError,
    InMemoryMetadataStore,
    PosixMetadataStore,
)


@pytest.mark.parametrize("make_store", [
    lambda tmp: InMemoryMetadataStore(),
    lambda tmp: PosixMetadataStore(str(tmp / "meta")),
], ids=["fake", "posix"])
def test_version_reservation_race(tmp_path, make_store):
    """N racing writers publish the same version: exactly ONE wins, the
    rest get ConcurrentCommitError, and the stored payload is the
    winner's — the single primitive exactly-once is built on."""
    store = make_store(tmp_path)
    n = 32
    results = [None] * n
    barrier = threading.Barrier(n)

    def attempt(i):
        barrier.wait()
        try:
            store.publish_version(7, f"payload-{i}")
            results[i] = "won"
        except ConcurrentCommitError:
            results[i] = "lost"

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results.count("won") == 1
    winner = results.index("won")
    assert store.read_version(7) == f"payload-{winner}"
    assert store.list_versions() == [7]


def test_store_roundtrip(tmp_path):
    for store in (InMemoryMetadataStore(), PosixMetadataStore(str(tmp_path / "m"))):
        assert store.read_hint() is None
        store.publish_version(0, '{"v": 0}')
        store.write_hint(0)
        assert store.read_hint() == 0
        with pytest.raises(ConcurrentCommitError):
            store.publish_version(0, "other")
        with pytest.raises(FileNotFoundError):
            store.read_version(5)
        store.publish_version(1, '{"v": 1}')
        store.write_hint(1)
        assert store.list_versions() == [0, 1]
        store.delete_version(0)
        assert store.list_versions() == [1]


def test_laketable_on_fake_store(spark, tmp_path):
    """The whole table commit protocol runs against the fake backend: no
    direct filesystem metadata anywhere in the commit path. Two handles
    sharing the store race the same epoch — exactly one applies."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
    from etl_spark.lake.table import LakeTable

    store = InMemoryMetadataStore()
    path = str(tmp_path / "tbl")
    t1 = LakeTable.create(spark, path, TRANSCRIPT_SCHEMA, num_buckets=2, store=store)
    t2 = LakeTable(spark, path, store=store)

    T_ = lambda s: dt.datetime.fromisoformat(s)
    batch = spark.createDataFrame(
        [("I", "c1", 0, "user", "hello", None, T_("2025-01-01 00:00:00"),
          T_("2025-01-01 00:00:01"), 1)],
        schema=CHANGE_SCHEMA,
    )
    s1 = apply_batch(t1, batch, epoch=0)
    assert not s1.skipped and s1.winners == 1
    # no _meta directory exists on disk — metadata lives in the store only
    import os
    assert not os.path.exists(os.path.join(path, "_meta"))
    # the racing handle fences on the same epoch
    s2 = apply_batch(t2, batch, epoch=0)
    assert s2.skipped
    # and both handles read the same snapshot
    assert t1.snapshot_df().count() == 1
    t2.refresh()
    assert t2.snapshot_df().count() == 1
