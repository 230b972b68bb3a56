"""MetadataStore conformance suite — the executable contract a backend
must satisfy to carry the commit protocol.

``LakeTable``'s exactly-once guarantees reduce to the properties checked
here (see metastore.py's module docstring for the design); any new
backend — a GCS/S3/Azure conditional-PUT store, a catalog-CAS store —
is correct for the engine **iff** it passes this class. Usage::

    # tests/test_my_backend.py
    from etl_spark.lake.metastore_conformance import MetadataStoreConformance

    class TestMyBackend(MetadataStoreConformance):
        def make_store(self, tmp_path):
            return MyBackend(...)   # a FRESH, EMPTY store per call

The suite is pure-Python (no Spark session needed) so it runs against a
live cloud bucket from any environment with credentials.

What the contract demands, property by property:

1. **Reservation atomicity** (``test_reservation_race``): of N
   concurrent ``publish_version(v, ...)`` calls, exactly one succeeds
   and the rest raise ``ConcurrentCommitError``; the stored payload is
   the winner's, intact. On S3 this is ``PUT If-None-Match: *`` (412 →
   raise), on GCS ``x-goog-if-generation-match: 0`` (412 → raise), on
   Azure Blob ``If-None-Match: *`` (409/412 → raise). Retried network
   errors after a success MUST NOT be reported as a lost race unless the
   stored payload is verified to differ (read-back compare is
   acceptable).
2. **Payload integrity** (``test_payload_roundtrip``): bytes in == bytes
   out, including multi-MB JSON and non-ASCII — the manifest payload is
   the source of truth for the table's file set.
3. **Read-your-writes for versions** (``test_publish_then_read``): a
   successful ``publish_version`` is immediately visible to
   ``read_version``/``list_versions`` from the same client. (S3 and GCS
   both give strong read-after-write for new keys; a backend that does
   not must front the version namespace with its CAS catalog.)
4. **Absent-version signalling** (``test_missing_version_raises``):
   ``read_version`` of an unpublished or deleted version raises
   ``FileNotFoundError`` (map the store's 404 onto it) — the vacuum and
   time-travel paths branch on that exception.
5. **Hint semantics** (``test_hint_advisory``): ``write_hint`` is a
   last-writer-wins pointer with NO atomicity requirement versus other
   writers, and it may be arbitrarily stale; readers recover the truth
   via ``max(list_versions())``. The contract only requires that a
   reader never sees a torn/partial value — write it atomically
   (tmp+rename, or a single object PUT).
6. **List completeness** (``test_list_versions``): ``list_versions``
   returns every published, undeleted version, sorted ascending, and
   tolerates an empty/nonexistent store ( ``[]`` / hint ``None`` ). On
   eventually-consistent LIST backends, enumerate via the hint + probe
   forward with ``version_exists`` instead of a raw LIST.
7. **Delete idempotence** (``test_delete``): ``delete_version`` removes
   the version from reads and listings; deleting an absent version MUST
   NOT corrupt anything (either raising FileNotFoundError or no-op is
   accepted — vacuum treats both as done).
8. **Independent version slots** (``test_versions_independent``):
   reserving v7 must not block a different writer reserving v8 — the
   optimistic-retry loop in LakeTable depends on losers rebasing onto
   the NEXT slot, not spinning on the same one.
"""

from __future__ import annotations

import threading

import pytest

from .metastore import ConcurrentCommitError, MetadataStore


class MetadataStoreConformance:
    """Inherit and implement ``make_store`` to certify a backend."""

    #: concurrency level for the reservation race (override if the
    #: backend rate-limits, but keep >= 8 — lower finds nothing)
    RACE_WRITERS = 32

    def make_store(self, tmp_path) -> MetadataStore:  # pragma: no cover
        raise NotImplementedError(
            "subclass must return a fresh, empty MetadataStore"
        )

    # -- 1. the primitive everything rests on ------------------------------

    def test_reservation_race(self, tmp_path):
        store = self.make_store(tmp_path)
        n = self.RACE_WRITERS
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
        assert results.count("won") == 1, f"expected 1 winner, got {results}"
        winner = results.index("won")
        assert store.read_version(7) == f"payload-{winner}"
        assert store.list_versions() == [7]

    def test_second_publish_loses_even_later(self, tmp_path):
        """The reservation holds forever, not just during the race window."""
        store = self.make_store(tmp_path)
        store.publish_version(3, "first")
        with pytest.raises(ConcurrentCommitError):
            store.publish_version(3, "second")
        assert store.read_version(3) == "first"

    # -- 2./3. payload + visibility ----------------------------------------

    def test_payload_roundtrip(self, tmp_path):
        store = self.make_store(tmp_path)
        big = '{"files": [' + ",".join(f'"part-{i:06d}"' for i in range(20_000)) + "]}"
        unicode_payload = '{"note": "résumé — 日本語 \U0001f9ea"}'
        store.publish_version(0, big)
        store.publish_version(1, unicode_payload)
        assert store.read_version(0) == big
        assert store.read_version(1) == unicode_payload

    def test_publish_then_read(self, tmp_path):
        store = self.make_store(tmp_path)
        store.publish_version(0, "v0")
        assert store.version_exists(0)
        assert store.read_version(0) == "v0"
        assert 0 in store.list_versions()

    # -- 4. absence signalling ----------------------------------------------

    def test_missing_version_raises(self, tmp_path):
        store = self.make_store(tmp_path)
        with pytest.raises(FileNotFoundError):
            store.read_version(5)
        assert not store.version_exists(5)

    # -- 5. hint is advisory, never torn -------------------------------------

    def test_hint_advisory(self, tmp_path):
        store = self.make_store(tmp_path)
        assert store.read_hint() is None
        store.publish_version(0, "v0")
        store.write_hint(0)
        assert store.read_hint() == 0
        # stale hint is legal: publish v1 but do NOT flip the hint;
        # readers must be able to recover the truth from list_versions
        store.publish_version(1, "v1")
        assert store.read_hint() == 0
        assert max(store.list_versions()) == 1
        # last-writer-wins re-point, including backwards (restore path)
        store.write_hint(1)
        store.write_hint(0)
        assert store.read_hint() == 0

    def test_hint_never_torn_under_writers(self, tmp_path):
        """Concurrent hint writers: every read returns SOME written value,
        never a torn/partial one."""
        store = self.make_store(tmp_path)
        store.publish_version(0, "v0")
        values = list(range(10))
        stop = threading.Event()
        seen_bad = []

        def writer():
            i = 0
            while not stop.is_set():
                store.write_hint(values[i % len(values)])
                i += 1

        def reader():
            while not stop.is_set():
                h = store.read_hint()
                if h is not None and h not in values:
                    seen_bad.append(h)

        ws = [threading.Thread(target=writer) for _ in range(4)]
        rs = [threading.Thread(target=reader) for _ in range(4)]
        for t in ws + rs:
            t.start()
        import time

        time.sleep(0.3)
        stop.set()
        for t in ws + rs:
            t.join()
        assert not seen_bad, f"torn hint values observed: {seen_bad[:5]}"

    # -- 6. listing ----------------------------------------------------------

    def test_list_versions(self, tmp_path):
        store = self.make_store(tmp_path)
        assert store.list_versions() == []
        for v in (2, 0, 5):
            store.publish_version(v, f"v{v}")
        assert store.list_versions() == [0, 2, 5]

    # -- 7. delete -------------------------------------------------------------

    def test_delete(self, tmp_path):
        store = self.make_store(tmp_path)
        store.publish_version(0, "v0")
        store.publish_version(1, "v1")
        store.delete_version(0)
        assert store.list_versions() == [1]
        with pytest.raises(FileNotFoundError):
            store.read_version(0)
        # idempotent-or-raises: either is conformant, corruption is not
        try:
            store.delete_version(0)
        except FileNotFoundError:
            pass
        assert store.list_versions() == [1]
        assert store.read_version(1) == "v1"

    # -- 8. slots are independent ---------------------------------------------

    def test_versions_independent(self, tmp_path):
        """A lost race on v must not poison v+1 — the rebase path."""
        store = self.make_store(tmp_path)
        store.publish_version(7, "w1")
        with pytest.raises(ConcurrentCommitError):
            store.publish_version(7, "w2")
        # the loser rebases onto the next slot and succeeds
        store.publish_version(8, "w2-rebased")
        assert store.list_versions() == [7, 8]
        assert store.read_version(8) == "w2-rebased"
