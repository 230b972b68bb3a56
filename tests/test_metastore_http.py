"""HttpMetadataStore certification: the full MetadataStoreConformance
contract over real sockets against the in-process conditional-PUT
reference server, plus the retry-disambiguation and listing-fallback
behaviors specific to the HTTP backend."""

import itertools

import pytest

from etl_spark.lake.metastore import ConcurrentCommitError
from etl_spark.lake.metastore_conformance import MetadataStoreConformance
from etl_spark.lake.metastore_http import (
    HttpMetadataStore,
    ReferenceConditionalPutServer,
)

_counter = itertools.count()


@pytest.fixture(scope="module")
def server():
    srv = ReferenceConditionalPutServer().start()
    yield srv
    srv.stop()


def _fresh_store(server, **kw) -> HttpMetadataStore:
    # unique prefix per call = a fresh, empty store namespace
    return HttpMetadataStore(f"{server.url}/tbl{next(_counter)}/_meta", **kw)


class TestHttpStoreConformance(MetadataStoreConformance):
    @pytest.fixture(autouse=True)
    def _bind_server(self, server):
        self._server = server

    def make_store(self, tmp_path):
        return _fresh_store(self._server)


class TestHttpStoreGcsHeaders(MetadataStoreConformance):
    """Same contract under the GCS precondition spelling
    (x-goog-if-generation-match: 0)."""

    @pytest.fixture(autouse=True)
    def _bind_server(self, server):
        self._server = server

    def make_store(self, tmp_path):
        return _fresh_store(
            self._server,
            precondition_headers={"x-goog-if-generation-match": "0"},
        )


def test_lost_response_retry_is_not_a_lost_race(server):
    """PUT applied server-side but the response dropped: the client's
    read-back-compare must report success, not ConcurrentCommitError."""
    store = _fresh_store(server)
    server.fail_next_put_response(f"/{store.base_url.split('/', 3)[3]}/v0.json")
    store.publish_version(0, "payload-A")  # must survive the dropped response
    assert store.read_version(0) == "payload-A"
    # and the reservation still holds against a REAL second writer
    with pytest.raises(ConcurrentCommitError):
        store.publish_version(0, "payload-B")
    assert store.read_version(0) == "payload-A"


def test_lost_response_then_real_racer_is_a_lost_race(server):
    """Response lost AND a different writer's payload is stored: the
    read-back compare sees a different body -> ConcurrentCommitError."""
    store = _fresh_store(server)
    racer = HttpMetadataStore(store.base_url)
    racer.publish_version(3, "racer-payload")
    with pytest.raises(ConcurrentCommitError):
        store.publish_version(3, "our-payload")
    assert store.read_version(3) == "racer-payload"


def test_list_fallback_probe_forward(server):
    """With the LIST endpoint unavailable, list_versions recovers the
    dense version chain from hint + probe-forward."""
    store = _fresh_store(server)
    for v in range(5):
        store.publish_version(v, f"v{v}")
    store.write_hint(2)  # stale on purpose

    class NoListStore(HttpMetadataStore):
        def _request(self, method, url, body=None, headers=None):
            if url.endswith("/?list"):
                return 501, b""
            return super()._request(method, url, body, headers)

    nl = NoListStore(store.base_url)
    assert nl.list_versions() == [0, 1, 2, 3, 4]


def test_laketable_commit_protocol_on_http_store(spark, tmp_path, server):
    """End-to-end: a LakeTable whose ENTIRE metadata commit path runs over
    HTTP conditional PUT (data files stay on the local filesystem, as
    they would ride s3a:// in a real deployment)."""
    import datetime as dt
    import os

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
    from etl_spark.lake.table import LakeTable

    store = _fresh_store(server)
    path = str(tmp_path / "tbl_http")
    t1 = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, num_buckets=2, store=store
    )
    T_ = lambda s: dt.datetime.fromisoformat(s)
    batch = spark.createDataFrame(
        [("I", "c1", 0, "user", "hello", None, T_("2025-01-01 00:00:00"),
          T_("2025-01-01 00:00:01"), 1),
         ("I", "c2", 0, "user", "hey", None, T_("2025-01-01 00:00:02"),
          T_("2025-01-01 00:00:03"), 2)],
        schema=CHANGE_SCHEMA,
    )
    s1 = apply_batch(t1, batch, epoch=0)
    assert not s1.skipped and s1.winners == 2
    # metadata lives server-side only — no local _meta directory
    assert not os.path.exists(os.path.join(path, "_meta"))
    assert store.list_versions(), "no metadata versions published over HTTP"
    # a second handle over a FRESH client sees the same committed state
    # and is epoch-fenced on replay
    t2 = LakeTable(spark, path, store=HttpMetadataStore(store.base_url))
    assert t2.snapshot_df().count() == 2
    assert apply_batch(t2, batch, epoch=0).skipped


def test_cdc_engine_replay_on_http_store(spark, tmp_path, server):
    """Full replay through CdcEngine with commit metadata over HTTP
    (the --meta-url CLI deployment shape), resumable by a second engine
    instance over a fresh client."""
    from etl_spark.cdc.engine import CdcEngine
    from etl_spark.datagen import write_change_log

    log = str(tmp_path / "log")
    write_change_log(spark, log, 4000, n_convs=100, n_epochs=3)
    store = _fresh_store(server)
    path = str(tmp_path / "tbl_engine_http")

    eng = CdcEngine(spark, path, num_buckets=4, store=store)
    r1 = eng.replay(log, stop_after=2)
    assert [s.epoch for s in r1] == [0, 1]

    # second engine, fresh HTTP client: resumes from the committed epoch
    eng2 = CdcEngine(
        spark, path, num_buckets=4, store=HttpMetadataStore(store.base_url)
    )
    r2 = eng2.replay(log)
    assert [s.epoch for s in r2] == [2]
    assert eng2.table.snapshot_df().count() > 0
    # replaying again is fully fenced
    assert eng2.replay(log) == []
