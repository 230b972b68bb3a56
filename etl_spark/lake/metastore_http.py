"""HttpMetadataStore — the commit protocol over generic HTTP
conditional PUT (the object-store backend, instantiable).

Every major object store exposes the one primitive the engine needs —
*create-if-absent* — through the same HTTP mechanism, an ETag
precondition on PUT:

================  =============================================  ==========
store             create-if-absent request header                 lost race
================  =============================================  ==========
Amazon S3         ``If-None-Match: *``  (PUT, since 2024)         412
Google GCS        ``x-goog-if-generation-match: 0``               412
Azure Blob        ``If-None-Match: *``                            409 / 412
generic WebDAV    ``If-None-Match: *`` (RFC 9110 §13.1.2)         412
================  =============================================  ==========

This module implements the client against the RFC 9110 form and maps
the store-specific spellings via a single ``precondition_headers``
hook, so pointing it at S3/GCS/Azure is a constructor argument, not a
new class. The sandbox has no cloud credentials, so the backend is
certified by running the full ``MetadataStoreConformance`` contract
against the in-process ``ReferenceConditionalPutServer`` below — a
complete, thread-safe rendition of the conditional-PUT semantics the
table above describes (tests/test_metastore_http.py, including the
32-writer reservation race over real sockets and a fault-injection
proxy that drops responses after the server applied the PUT).

Retry correctness (conformance contract, property 1): a PUT whose
*response* is lost may have been *applied*. Blind retry would then see
412 and mis-report our own successful write as a lost race. On any
retryable failure the client therefore reads the key back and compares
payloads — equal means our earlier attempt landed (success); different
means a real concurrent writer (``ConcurrentCommitError``). S3/GCS
give strong read-after-write for new keys, so the read-back is sound.

Listing: ``list_versions`` prefers the backend's LIST endpoint (a GET
on the prefix; S3 ``list-objects-v2`` / GCS ``o?prefix=`` map onto the
same hook) and falls back to hint + probe-forward ``version_exists``
for stores whose LIST is eventually consistent — exactly the recovery
rule the conformance contract's property 6 prescribes.

Deployment note: only the *metadata* commit path needs this class; the
parquet data files ride Spark's own Hadoop filesystem connector for
the same bucket (s3a://, gs://). Reference analogue: the reference
delegates commit atomicity to BigQuery job atomicity
(/root/reference/etl/dags/user_history/user_history/dag.py); on a lake
it reduces to this conditional PUT.
"""

from __future__ import annotations

import json
import threading
import time
import urllib.error
import urllib.parse
import urllib.request
from http.client import HTTPException as _http_exc

from .metastore import ConcurrentCommitError, MetadataStore

#: HTTP statuses that signal "precondition failed" across stores
#: (412 per RFC 9110; Azure Blob answers 409 on If-None-Match: *).
_PRECONDITION_STATUSES = frozenset({409, 412})
#: transient statuses worth a retry (throttle + server errors)
_RETRYABLE_STATUSES = frozenset({429, 500, 502, 503, 504})


class HttpMetadataStore(MetadataStore):
    """Commit-protocol storage over HTTP conditional PUT.

    ``base_url`` is the table's metadata prefix (e.g.
    ``https://bucket.host/warehouse/events/_meta``); versions live at
    ``{base_url}/v{N}.json`` and the hint at
    ``{base_url}/version-hint.text``.

    ``precondition_headers`` adapts the create-if-absent spelling:
    default is the RFC 9110 / S3 / Azure form ``If-None-Match: *``;
    pass ``{"x-goog-if-generation-match": "0"}`` for GCS.
    """

    def __init__(
        self,
        base_url: str,
        precondition_headers: dict[str, str] | None = None,
        extra_headers: dict[str, str] | None = None,
        retries: int = 3,
        retry_backoff_s: float = 0.05,
        timeout_s: float = 30.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.precondition_headers = dict(
            precondition_headers or {"If-None-Match": "*"}
        )
        self.extra_headers = dict(extra_headers or {})
        self.retries = retries
        self.retry_backoff_s = retry_backoff_s
        self.timeout_s = timeout_s

    # -- store presets ---------------------------------------------------------

    @classmethod
    def for_gcs(
        cls,
        base_url: str,
        auth_headers: dict[str, str] | None = None,
        **kw,
    ) -> "HttpMetadataStore":
        """Google Cloud Storage preset: the create-if-absent spelling is
        ``x-goog-if-generation-match: 0`` (412 on lost race).

        ``base_url`` is the XML-API object prefix, e.g.
        ``https://storage.googleapis.com/<bucket>/<table>/_meta``;
        ``auth_headers`` carries ``{"Authorization": "Bearer <token>"}``
        (OAuth2 access token — ``gcloud auth print-access-token``).
        Certified against the conformance suite's reference server
        (tests/test_metastore_http.py); certify a LIVE bucket with
        ``python scripts/certify_metastore.py --preset gcs --url <...>``.
        """
        return cls(
            base_url,
            precondition_headers={"x-goog-if-generation-match": "0"},
            extra_headers=auth_headers,
            **kw,
        )

    @classmethod
    def for_s3(
        cls,
        base_url: str,
        auth_headers: dict[str, str] | None = None,
        **kw,
    ) -> "HttpMetadataStore":
        """Amazon S3 preset: conditional writes via ``If-None-Match: *``
        (supported on PUT since 2024; 412 on lost race).

        SigV4 signing note: this client sends UNSIGNED requests — S3
        requires every request signed with AWS Signature v4 over the
        canonical headers, and the conditional header MUST be included
        in the signed set. Use whichever fits the deployment: (a) an
        s3-compatible endpoint that accepts bearer/static auth headers
        passed via ``auth_headers`` (MinIO/Ceph RGW anonymous-write
        test buckets, VPC-gated buckets with endpoint policies), or
        (b) a local SigV4-signing proxy in front of this client — the
        HTTP exchange this class is certified for is unchanged either
        way. Certify the endpoint with
        ``python scripts/certify_metastore.py --preset s3 --url <...>``.
        """
        return cls(
            base_url,
            precondition_headers={"If-None-Match": "*"},
            extra_headers=auth_headers,
            **kw,
        )

    # -- low-level request ----------------------------------------------------

    def _url(self, name: str) -> str:
        return f"{self.base_url}/{urllib.parse.quote(name)}"

    def _request(
        self,
        method: str,
        url: str,
        body: bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> tuple[int, bytes]:
        """One HTTP round-trip → (status, body). Raises URLError only on
        transport failure; HTTP error statuses are returned, not raised."""
        req = urllib.request.Request(url, data=body, method=method)
        for k, v in {**self.extra_headers, **(headers or {})}.items():
            req.add_header(k, v)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx: a normal answer here
            return e.code, e.read()

    def _request_retry(
        self,
        method: str,
        url: str,
        body: bytes | None = None,
        headers: dict[str, str] | None = None,
    ) -> tuple[int, bytes]:
        """``_request`` with transient-failure retries for IDEMPOTENT
        operations (GET / unconditional PUT / DELETE): 429/5xx statuses
        and transport errors are retried with backoff; the first
        non-retryable answer is returned. The conditional PUT must NOT
        use this — a lost-response retry there needs the read-back
        disambiguation in ``publish_version``."""
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                status, resp = self._request(method, url, body, headers)
            except (urllib.error.URLError, ConnectionError, _http_exc) as e:
                last = e
                status, resp = None, b""
            if status is not None and status not in _RETRYABLE_STATUSES:
                return status, resp
            if attempt < self.retries:
                time.sleep(self.retry_backoff_s * (2**attempt))
        if last is not None:
            raise OSError(f"{method} {url}: transport failed after retries: {last}")
        raise OSError(f"{method} {url} failed with HTTP {status} after retries")

    # -- the reservation primitive --------------------------------------------

    def publish_version(self, version: int, payload: str) -> None:
        url = self._url(f"v{version}.json")
        body = payload.encode("utf-8")
        last_exc: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                status, _ = self._request(
                    "PUT", url, body, self.precondition_headers
                )
            except (urllib.error.URLError, ConnectionError, _http_exc) as e:
                # response lost — the PUT may or may not have been applied;
                # disambiguate by read-back below
                last_exc = e
                status = None
            if status is not None and 200 <= status < 300:
                return
            if status in _PRECONDITION_STATUSES or status is None:
                # 412 after OUR earlier (response-lost) success must not be
                # reported as a lost race: read back and compare
                try:
                    stored = self.read_version(version)
                except FileNotFoundError:
                    # transport failure and nothing stored: retry the PUT.
                    # 412/409 with the key absent is an eventual-consistency
                    # artifact or a race with delete; retry resolves it too.
                    time.sleep(self.retry_backoff_s * (2**attempt))
                    continue
                except OSError as e:
                    # transient failure on the disambiguation GET (its own
                    # retries exhausted): the publish outcome is still
                    # unknown, so keep retrying the publish loop rather
                    # than misreporting an applied PUT as a hard failure
                    if attempt < self.retries:
                        last_exc = e
                        time.sleep(self.retry_backoff_s * (2**attempt))
                        continue
                    raise
                if stored == payload:
                    return  # our write landed; the error was the retry's
                raise ConcurrentCommitError(
                    f"metadata version v{version}.json already exists — "
                    "concurrent writer?"
                )
            if status in _RETRYABLE_STATUSES and attempt < self.retries:
                time.sleep(self.retry_backoff_s * (2**attempt))
                continue
            raise OSError(f"PUT {url} failed with HTTP {status}")
        raise OSError(f"PUT {url}: transport failed after retries: {last_exc}")

    # -- plain reads/writes ----------------------------------------------------

    def read_version(self, version: int) -> str:
        status, body = self._request_retry("GET", self._url(f"v{version}.json"))
        if status == 404:
            raise FileNotFoundError(f"metadata version {version} not found")
        if not (200 <= status < 300):
            raise OSError(f"GET v{version}.json failed with HTTP {status}")
        return body.decode("utf-8")

    def write_hint(self, version: int) -> None:
        # a single-object PUT is atomic on every listed store — readers see
        # the old or the new body, never a torn one (contract property 5).
        # Unconditional and idempotent, so transient failures retry blindly:
        # a hint left behind the published version would otherwise wedge
        # readers on stale metadata until the next successful commit.
        status, _ = self._request_retry(
            "PUT", self._url("version-hint.text"), str(version).encode()
        )
        if not (200 <= status < 300):
            raise OSError(f"hint PUT failed with HTTP {status}")

    def read_hint(self) -> int | None:
        status, body = self._request_retry("GET", self._url("version-hint.text"))
        if status == 404:
            return None
        if not (200 <= status < 300):
            raise OSError(f"hint GET failed with HTTP {status}")
        text = body.decode("utf-8").strip()
        return int(text) if text else None

    #: statuses that mean the backend has no LIST endpoint at this URL —
    #: fall back to probing. Transient statuses are NOT here: those retry
    #: in _request_retry and then raise, never silently degrade to probes.
    _NO_LIST_STATUSES = frozenset({400, 403, 404, 405, 501})
    #: probe-forward gap tolerance: versions are published contiguously
    #: (each commit reserves latest+1), but vacuum deletes old ones and a
    #: lost hint can trail by a few commits — keep probing through this
    #: many consecutive missing slots before declaring the end.
    _PROBE_GAP = 8
    #: downward-probe budget below the hint (no-LIST backends): how many
    #: consecutive missing slots before declaring the vacuumed region.
    _PROBE_GAP_DOWN = 64

    def list_versions(self) -> list[int]:
        listed: list[int] | None = None
        status, body = self._request_retry("GET", self.base_url + "/?list")
        if 200 <= status < 300:
            try:
                names = json.loads(body.decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                names = None  # not a LIST answer (e.g. index page) — probe
            if isinstance(names, list):
                listed = []
                for name in names:
                    stem = str(name).removeprefix("v").removesuffix(".json")
                    if str(name).startswith("v") and str(name).endswith(".json") and stem.isdigit():
                        listed.append(int(stem))
        elif status not in self._NO_LIST_STATUSES:
            raise OSError(f"LIST {self.base_url} failed with HTTP {status}")
        if listed is not None:
            # LIST may be eventually consistent — it can miss recently
            # published keys ANYWHERE above the slots it did return, not
            # only at the tail (it may also have caught the newest key but
            # missed ones just below it). The version keys themselves are
            # strong read-after-write, so union with an individual probe
            # of every slot above the LIST's view: gap-tolerant like the
            # no-LIST path (vacuum leaves low-end holes), and never ending
            # below the hint (the hint is ≤ the latest published version,
            # so slots up to it are worth probing through any gap length).
            out = set(listed)
            hint = self.read_hint() or 0
            v = (max(out) + 1) if out else 0
            misses = 0
            while misses <= self._PROBE_GAP or v <= hint:
                if self.version_exists(v):
                    out.add(v)
                    misses = 0
                else:
                    misses += 1
                v += 1
            return sorted(out)
        # no LIST endpoint: hint + probe, O(retained versions) not
        # O(current version). Above the hint, probe forward tolerating up
        # to _PROBE_GAP consecutive misses (covers a lost/stale hint
        # trailing a few commits). BELOW the hint, probe downward and stop
        # after _PROBE_GAP_DOWN consecutive misses: vacuum deletes the old
        # tail contiguously (and raises on a failed delete), so the region
        # below the lowest survivor is one solid gap — probing every slot
        # from 0 would cost a long-lived table ~version-count HEADs per
        # maintenance run. A survivor stranded more than _PROBE_GAP_DOWN
        # below the next one up is invisible to this backend (document
        # over pay: such a hole needs repeated silent delete failures,
        # which delete_version turns into loud errors instead).
        hint = self.read_hint()
        start = hint or 0
        out_l = []
        v, misses = start + 1, 0
        while misses <= self._PROBE_GAP:
            if self.version_exists(v):
                out_l.append(v)
                misses = 0
            else:
                misses += 1
            v += 1
        if hint is None:
            # no hint was ever written (young table / hint object lost):
            # nothing to anchor a bounded downward probe — scan from 0
            out_l = [u for u in range(0, start + 1) if self.version_exists(u)] + out_l
            return out_l
        down = []
        v, misses = start, 0
        while v >= 0 and misses <= self._PROBE_GAP_DOWN:
            if self.version_exists(v):
                down.append(v)
                misses = 0
            else:
                misses += 1
            v -= 1
        return sorted(down) + out_l

    def version_exists(self, version: int) -> bool:
        # HEAD, not the base class's full-payload GET: the probe paths
        # above touch many versions and metadata manifests are multi-MB
        status, _ = self._request_retry("HEAD", self._url(f"v{version}.json"))
        if status == 404:
            return False
        if not (200 <= status < 300):
            raise OSError(f"HEAD v{version}.json failed with HTTP {status}")
        return True

    def delete_version(self, version: int) -> None:
        status, _ = self._request_retry("DELETE", self._url(f"v{version}.json"))
        if status not in (200, 202, 204, 404):
            raise OSError(f"DELETE v{version}.json failed with HTTP {status}")


# ---------------------------------------------------------------------------
# Reference server: the conditional-PUT semantics the client targets,
# runnable in-process. Used by the conformance tests; doubles as the
# executable specification of what a real bucket provides.
# ---------------------------------------------------------------------------


class ReferenceConditionalPutServer:
    """Thread-safe in-process object store speaking the HTTP subset above.

    Semantics (all under one lock, i.e. the store-side atomicity object
    stores guarantee per key):

    * ``PUT`` with ``If-None-Match: *`` (or
      ``x-goog-if-generation-match: 0``) → 412 if the key exists, else
      create (201).
    * unconditional ``PUT`` → last-writer-wins overwrite (200) — whole
      bodies only, so readers never see a torn value.
    * ``GET`` → 200 body / 404; ``GET <prefix>/?list`` → JSON array of
      key names under the prefix.
    * ``DELETE`` → 204 / 404.

    ``fail_next_put_response`` makes the server apply the next matching
    PUT and then close the socket without answering — the
    "response lost after success" fault the client's read-back-compare
    retry exists for.
    """

    def __init__(self):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

        store = self  # close over for the handler
        self._lock = threading.Lock()
        self._objects: dict[str, bytes] = {}
        self._drop_puts: set[str] = set()  # paths whose next PUT response is dropped
        self._hidden_from_list: set[str] = set()  # EC simulation: GET/HEAD see these, LIST doesn't
        #: (method, path) -> queued statuses to answer WITHOUT applying
        self._inject: dict[tuple[str, str], list[int]] = {}

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def _body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n) if n else b""

            def _reply(self, status: int, body: bytes = b""):
                self.send_response(status)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                if body:
                    self.wfile.write(body)

            def _injected(self, method: str) -> bool:
                """Answer a queued fault status (without applying) if one
                is staged for (method, path)."""
                with store._lock:
                    q = store._inject.get((method, self.path))
                    status = q.pop(0) if q else None
                if status is None:
                    return False
                # a request with a body must still be drained off the socket
                if method in ("PUT", "POST"):
                    self._body()
                self._reply(status)
                return True

            def do_PUT(self):
                if self._injected("PUT"):
                    return
                body = self._body()
                conditional = (
                    self.headers.get("If-None-Match") == "*"
                    or self.headers.get("x-goog-if-generation-match") == "0"
                )
                with store._lock:
                    exists = self.path in store._objects
                    if conditional and exists:
                        status = 412
                    else:
                        store._objects[self.path] = body
                        status = 201 if not exists else 200
                    drop = False
                    # only an APPLIED put can have its response "lost"
                    if status != 412 and self.path in store._drop_puts:
                        store._drop_puts.discard(self.path)
                        drop = True
                if drop:
                    # simulate "response lost after the server applied it"
                    self.close_connection = True
                    self.wfile.close()
                    return
                self._reply(status)

            def do_GET(self):
                if self._injected("GET"):
                    return
                if self.path.endswith("/?list"):
                    prefix = self.path[: -len("?list")]
                    with store._lock:
                        names = [
                            p[len(prefix):]
                            for p in store._objects
                            if p.startswith(prefix)
                            and "/" not in p[len(prefix):]
                            and p not in store._hidden_from_list
                        ]
                    self._reply(200, json.dumps(sorted(names)).encode())
                    return
                with store._lock:
                    body = store._objects.get(self.path)
                if body is None:
                    self._reply(404)
                else:
                    self._reply(200, body)

            def do_HEAD(self):
                if self._injected("HEAD"):
                    return
                with store._lock:
                    exists = self.path in store._objects
                self._reply(200 if exists else 404)

            def do_DELETE(self):
                if self._injected("DELETE"):
                    return
                with store._lock:
                    existed = store._objects.pop(self.path, None) is not None
                self._reply(204 if existed else 404)

        self._httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )

    # -- lifecycle -------------------------------------------------------------

    def start(self) -> "ReferenceConditionalPutServer":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    # -- fault injection --------------------------------------------------------

    def fail_next_put_response(self, path: str) -> None:
        """Next APPLIED PUT to ``path`` gets its response dropped (the
        client sees a transport error; the store saw a success)."""
        with self._lock:
            self._drop_puts.add(path)

    def inject_status(self, method: str, path: str, *statuses: int) -> None:
        """Queue fault answers: the next ``len(statuses)`` requests
        matching ``(method, path)`` are answered with those statuses in
        order WITHOUT being applied (throttle/5xx simulation)."""
        with self._lock:
            self._inject.setdefault((method, path), []).extend(statuses)

    def hide_from_list(self, path: str, hidden: bool = True) -> None:
        """Eventual-consistency simulation: while hidden, ``path`` is
        omitted from LIST answers but GET/HEAD still serve it — the
        "LIST lags the strongly consistent keys" behavior the client's
        probe-union in ``list_versions`` exists for."""
        with self._lock:
            if hidden:
                self._hidden_from_list.add(path)
            else:
                self._hidden_from_list.discard(path)
