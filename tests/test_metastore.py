"""Commit-protocol backend (lake/metastore.py): both shipped backends
run through the full conformance contract
(lake/metastore_conformance.py), plus LakeTable running entirely on the
in-memory conditional-PUT fake — no direct filesystem metadata in the
commit path."""

import pytest

from etl_spark.lake.metastore import (
    InMemoryMetadataStore,
    PosixMetadataStore,
)
from etl_spark.lake.metastore_conformance import MetadataStoreConformance


class TestPosixStoreConformance(MetadataStoreConformance):
    def make_store(self, tmp_path):
        # fresh subdir per call — conformance methods may build >1 store
        import uuid

        return PosixMetadataStore(str(tmp_path / f"meta-{uuid.uuid4().hex[:8]}"))


class TestInMemoryStoreConformance(MetadataStoreConformance):
    def make_store(self, tmp_path):
        return InMemoryMetadataStore()


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


def test_atomic_write_text_thread_safe(tmp_path):
    """Racing threads of ONE process writing the same marker must never
    tear or crash: the tmp name is unique per attempt (pid alone would
    collide, letting one thread rename another's partial write)."""
    import threading

    from etl_spark.lake.metastore import _atomic_write_text

    target = str(tmp_path / "marker.text")
    payloads = [f"value-{i:04d}" * 64 for i in range(16)]
    errs: list[Exception] = []

    def write(p):
        try:
            for _ in range(20):
                _atomic_write_text(target, p)
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=write, args=(p,)) for p in payloads]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    with open(target) as f:
        assert f.read() in payloads  # one complete write, never torn
