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
    """Same contract under the GCS preset constructor — certifies both
    the x-goog-if-generation-match: 0 spelling and that for_gcs wires
    auth headers onto every request."""

    @pytest.fixture(autouse=True)
    def _bind_server(self, server):
        self._server = server

    def make_store(self, tmp_path):
        from etl_spark.lake.metastore_http import HttpMetadataStore as H

        store = H.for_gcs(
            f"{self._server.url}/tbl{next(_counter)}/_meta",
            auth_headers={"Authorization": "Bearer test-token"},
        )
        assert store.precondition_headers == {"x-goog-if-generation-match": "0"}
        return store


class TestHttpStoreS3Preset(MetadataStoreConformance):
    """Same contract under the S3 preset constructor (If-None-Match: *
    conditional-write spelling; SigV4 signing rides outside this client —
    see HttpMetadataStore.for_s3's docstring)."""

    @pytest.fixture(autouse=True)
    def _bind_server(self, server):
        self._server = server

    def make_store(self, tmp_path):
        from etl_spark.lake.metastore_http import HttpMetadataStore as H

        store = H.for_s3(f"{self._server.url}/tbl{next(_counter)}/_meta")
        assert store.precondition_headers == {"If-None-Match": "*"}
        return store


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


def _path(store: HttpMetadataStore, name: str) -> str:
    """Server-side path for an object under the store's prefix."""
    return f"/{store.base_url.split('/', 3)[3]}/{name}"


def test_transient_statuses_retry_idempotent_ops(server):
    """429/5xx on idempotent operations (GET / unconditional PUT / HEAD)
    retry with backoff and succeed once the fault clears."""
    store = _fresh_store(server, retries=2, retry_backoff_s=0.001)
    store.publish_version(0, "p0")
    server.inject_status("GET", _path(store, "v0.json"), 503)
    assert store.read_version(0) == "p0"
    server.inject_status("PUT", _path(store, "version-hint.text"), 503, 500)
    store.write_hint(0)
    assert store.read_hint() == 0
    server.inject_status("HEAD", _path(store, "v0.json"), 429)
    assert store.version_exists(0) is True


def test_transient_exhaustion_raises_oserror(server):
    """A fault outlasting the retry budget surfaces as OSError — never as
    FileNotFoundError (which would misread an outage as 'no such version')."""
    store = _fresh_store(server, retries=1, retry_backoff_s=0.001)
    store.publish_version(0, "p0")
    server.inject_status("GET", _path(store, "v0.json"), 503, 503)  # retries+1
    with pytest.raises(OSError) as ei:
        store.read_version(0)
    assert not isinstance(ei.value, FileNotFoundError)
    assert store.read_version(0) == "p0"  # fault drained; next read is clean


def test_lost_response_with_transient_disambiguation_get(server):
    """Worst case compound fault: the conditional PUT's response is lost
    after the server applied it AND the disambiguation read-back fails
    transiently past its own retry budget. The publish loop must keep
    retrying (outcome still unknown) and land success — not report a
    hard failure for a write that took effect."""
    store = _fresh_store(server, retries=1, retry_backoff_s=0.001)
    path = _path(store, "v0.json")
    server.fail_next_put_response(path)
    server.inject_status("GET", path, 503, 503)  # exhausts one GET's retries
    store.publish_version(0, "payload")
    assert store.read_version(0) == "payload"


def test_list_union_probes_past_ec_listing(server):
    """An eventually-consistent LIST that misses just-published keys is
    healed by probing forward on the strongly-consistent version keys."""
    import json as _json

    store = _fresh_store(server)
    for v in range(4):
        store.publish_version(v, f"v{v}")
    store.write_hint(1)  # stale alongside the stale LIST

    class StaleListStore(HttpMetadataStore):
        def _request(self, method, url, body=None, headers=None):
            if url.endswith("/?list"):
                return 200, _json.dumps(["v0.json"]).encode()
            return super()._request(method, url, body, headers)

    assert StaleListStore(store.base_url).list_versions() == [0, 1, 2, 3]


def test_list_union_recovers_mid_range_ec_gap(server):
    """An eventually-consistent LIST can miss keys in the MIDDLE of the
    range it returns nothing for — e.g. it caught v0-v2 but not v3-v4,
    while the hint already points at v5. Versions are published
    contiguously, so every slot above the LIST's view must be probed
    individually; starting the probe at the hint would silently drop
    the existing v3/v4 (list-completeness contract, property 6)."""
    store = _fresh_store(server)
    for v in range(7):
        store.publish_version(v, f"v{v}")
    store.write_hint(5)  # hint trails the head by one, as after a crash
    for v in (3, 4, 5, 6):  # LIST lags: newest keys invisible to it
        server.hide_from_list(_path(store, f"v{v}.json"))
    assert store.list_versions() == [0, 1, 2, 3, 4, 5, 6]
    for v in (3, 4, 5, 6):
        server.hide_from_list(_path(store, f"v{v}.json"), hidden=False)


def test_probe_fallback_stale_hint_and_vacuumed_low_end(server):
    """No LIST endpoint, the low versions vacuumed, and the hint both
    stale and pointing at a deleted slot: hint+probe still recovers the
    surviving chain (gap tolerance covers the hint trailing the head)."""
    store = _fresh_store(server)
    for v in range(7):
        store.publish_version(v, f"v{v}")
    store.delete_version(0)
    store.delete_version(1)
    store.write_hint(1)

    class NoListStore(HttpMetadataStore):
        def _request(self, method, url, body=None, headers=None):
            if url.endswith("/?list"):
                return 405, b""
            return super()._request(method, url, body, headers)

    assert NoListStore(store.base_url).list_versions() == [2, 3, 4, 5, 6]


def test_commit_survives_hint_write_failure_and_reader_probes_forward(
    spark, tmp_path, server
):
    """The version publish IS the commit; the hint is an advisory pointer.
    A hint store failing past its retries must not fail the commit, and a
    fresh reader must probe forward past the stale hint to the true
    latest version (never serving stale state)."""
    import datetime as dt

    from etl_spark.cdc.apply import apply_batch
    from etl_spark.cdc.engine import CHANGE_SCHEMA, TRANSCRIPT_SCHEMA
    from etl_spark.lake.table import LakeTable

    store = _fresh_store(server, retries=1, retry_backoff_s=0.001)
    path = str(tmp_path / "tbl_hintloss")
    t1 = LakeTable.create(
        spark, path, TRANSCRIPT_SCHEMA, num_buckets=2, store=store
    )
    T_ = lambda s: dt.datetime.fromisoformat(s)
    batch = spark.createDataFrame(
        [("I", "c1", 0, "user", "hello", None, T_("2025-01-01 00:00:00"),
          T_("2025-01-01 00:00:01"), 1)],
        schema=CHANGE_SCHEMA,
    )
    # every hint PUT from here on fails (each write_hint = retries+1 tries)
    server.inject_status(
        "PUT", _path(store, "version-hint.text"), *([503] * 8)
    )
    s1 = apply_batch(t1, batch, epoch=0)
    assert not s1.skipped and s1.winners == 1  # data commit succeeded
    fresh = HttpMetadataStore(store.base_url)
    assert fresh.read_hint() < max(fresh.list_versions())  # hint truly stale
    t2 = LakeTable(spark, path, store=fresh)
    assert t2.snapshot_df().count() == 1
    assert apply_batch(t2, batch, epoch=0).skipped  # fenced on TRUE state


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


def test_no_list_probe_is_bounded_by_retained_not_version(server):
    """A long-lived table (version ~5000, old tail vacuumed) on a no-LIST
    backend: list_versions must probe O(retained + gap) slots, not issue
    one HEAD per historical version — vacuum on such a store used to cost
    ~current-version HEAD requests per maintenance run."""
    store = _fresh_store(server)
    for v in (4998, 4999, 5000):  # the retained tail of a vacuumed table
        store.publish_version(v, f"v{v}")
    store.write_hint(5000)

    heads = {"n": 0}

    class CountingNoListStore(HttpMetadataStore):
        def _request(self, method, url, body=None, headers=None):
            if url.endswith("/?list"):
                return 405, b""
            if method == "HEAD":
                heads["n"] += 1
            return super()._request(method, url, body, headers)

    nl = CountingNoListStore(store.base_url)
    assert nl.list_versions() == [4998, 4999, 5000]
    budget = nl._PROBE_GAP_DOWN + nl._PROBE_GAP + 3 + 8
    assert heads["n"] <= budget, f"{heads['n']} HEADs for a 3-version table"

    # a young table with no hint object still enumerates from zero
    store2 = _fresh_store(server)
    for v in (0, 2, 5):
        store2.publish_version(v, f"v{v}")

    class NoListStore2(HttpMetadataStore):
        def _request(self, method, url, body=None, headers=None):
            if url.endswith("/?list"):
                return 405, b""
            return super()._request(method, url, body, headers)

    assert NoListStore2(store2.base_url).list_versions() == [0, 2, 5]
