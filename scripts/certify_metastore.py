#!/usr/bin/env python
"""One-command certification of a LIVE object-store endpoint as a
LakeTable metadata backend.

Runs the executable MetadataStoreConformance contract
(etl_spark/lake/metastore_conformance.py — reservation race, payload
round-trip, absence signalling, hint semantics, vacuum recovery)
against a real bucket URL through the chosen HttpMetadataStore preset:

    # GCS (XML API; token from `gcloud auth print-access-token`)
    python scripts/certify_metastore.py --preset gcs \
        --url https://storage.googleapis.com/BUCKET/tbl/_meta \
        --bearer "$(gcloud auth print-access-token)"

    # S3-compatible endpoint (MinIO/Ceph RGW/proxy — see
    # HttpMetadataStore.for_s3's SigV4 note)
    python scripts/certify_metastore.py --preset s3 \
        --url https://minio.local:9000/bucket/tbl/_meta

    # raw RFC 9110 conditional PUT (WebDAV, the in-repo reference server)
    python scripts/certify_metastore.py --preset generic --url http://...

The run WRITES to the prefix (and deletes what it wrote) — point it at
a scratch prefix, never a live table. Exit 0 = every contract property
passed; any failure prints the pytest output.

This sandbox has no cloud credentials, so in-repo certification runs
the same contract against ReferenceConditionalPutServer
(tests/test_metastore_http.py); this script is the identical check
aimed at a real endpoint.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=("gcs", "s3", "generic"), required=True)
    ap.add_argument("--url", required=True, help="metadata prefix URL (scratch!)")
    ap.add_argument("--bearer", default=None, help="OAuth2 bearer token")
    ap.add_argument(
        "--race-writers", type=int, default=16,
        help="reservation-race concurrency (lower if the store throttles)",
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import uuid

    run_id = uuid.uuid4().hex[:8]  # fresh namespaces even on a reused prefix
    auth = {"Authorization": f"Bearer {args.bearer}"} if args.bearer else None
    conftest = f"""
import itertools
import pytest

from etl_spark.lake.metastore_conformance import MetadataStoreConformance
from etl_spark.lake.metastore_http import HttpMetadataStore

_counter = itertools.count()
_URL = {args.url!r}
_AUTH = {auth!r}


class TestLiveEndpoint(MetadataStoreConformance):
    RACE_WRITERS = {args.race_writers}

    def make_store(self, tmp_path):
        base = f"{{_URL.rstrip('/')}}/certify-{run_id}-{{next(_counter)}}"
        preset = {args.preset!r}
        if preset == "gcs":
            return HttpMetadataStore.for_gcs(base, auth_headers=_AUTH)
        if preset == "s3":
            return HttpMetadataStore.for_s3(base, auth_headers=_AUTH)
        return HttpMetadataStore(base, extra_headers=_AUTH)
"""
    import pytest

    with tempfile.TemporaryDirectory(prefix="certify_meta_") as d:
        test_path = os.path.join(d, "test_live_conformance.py")
        with open(test_path, "w") as f:
            f.write(conftest)
        rc = pytest.main(["-q", "-x", test_path, "--rootdir", d, "-p", "no:cacheprovider"])
    print(
        ("CERTIFIED: endpoint satisfies the MetadataStore contract"
         if rc == 0 else "FAILED: endpoint is NOT safe as a commit backend"),
        file=sys.stderr,
    )
    return int(rc)


if __name__ == "__main__":
    sys.exit(main())
