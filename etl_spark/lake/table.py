"""LakeTable — a minimal Iceberg-style versioned table on parquet.

The sandbox image has no Iceberg/Delta jars, so the engine carries its own
lightweight ACID table format with exactly the properties the north rule
needs, built only on parquet + atomic metadata swaps:

  * **Snapshot isolation / atomic commits** — every commit writes a new
    immutable metadata file ``_meta/v{N}.json`` via write-temp-then-rename
    (atomic on POSIX), then flips ``_meta/version-hint.text``. Readers
    resolve the hint; a crash mid-commit leaves the previous version live
    and at worst an orphan data directory that no metadata references.
  * **Snapshot IDs + commit-epoch fencing** — metadata records, per source,
    the highest committed epoch (micro-batch id). Replayed epochs after a
    crash/restart are detected and skipped: the exactly-once sink
    (reference skip-guard: /root/reference/etl/dags/user_history/include/
    load/modules/mod_load_data_declare.sql:30-36; anti-join insert:
    mod_data_insert.sql:2-7).
  * **Bucket partitioning** — data lives under ``data/snap-{id}/_bucket=K``;
    the files map points each bucket at its current snapshot directory, so
    a MERGE rewrites only dirty buckets (copy-on-write) and reads prune to
    them. At 100 TB the bucket count is the unit of merge parallelism and
    write amplification control.
  * **Field-ID schema evolution** — see ``lake.schema``; each data
    directory records the schema version it was written with, and reads
    align every directory to the current schema (schema-on-read), so
    int→long widening never rewrites history.

Single-writer per table (like the reference's ``max_active_runs=1``,
/root/reference/etl/dags/user_history/DAG_user_history.py:45-51);
concurrent committers are detected by the version-file existence check.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import TableSchema, align

META_DIR = "_meta"
HINT = "version-hint.text"

# Engine-internal columns stored alongside the payload in every data file.
INTERNAL_COLS = ["_op_ts", "_lsn", "_tombstone", "_bucket"]
_INTERNAL_TYPES = {
    "_op_ts": T.TimestampType(),
    "_lsn": T.LongType(),
    "_tombstone": T.BooleanType(),
    "_bucket": T.IntegerType(),
}


class ConcurrentCommitError(RuntimeError):
    pass


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self._meta = self._load_meta()

    # -- creation / metadata ------------------------------------------------

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        bucket_key: str = "conv_id",
        num_buckets: int = 16,
        if_not_exists: bool = False,
    ) -> "LakeTable":
        meta_dir = os.path.join(path, META_DIR)
        if os.path.exists(os.path.join(meta_dir, HINT)):
            if if_not_exists:
                return LakeTable(spark, path)
            raise FileExistsError(f"table already exists at {path}")
        os.makedirs(meta_dir, exist_ok=True)
        ts = TableSchema.from_struct(schema)
        meta = {
            "format_version": 1,
            "table_uuid": str(uuid.uuid4()),
            "version": 0,
            "current_snapshot_id": 0,
            "partition": {"bucket_key": bucket_key, "num_buckets": num_buckets},
            "schemas": {"0": ts.to_json()},
            "current_schema_version": 0,
            "snapshots": [],
            "committed_epochs": {},
            # bucket(str) -> {"path": rel_dir, "schema_version": int}
            "files": {},
        }
        _atomic_write_json(os.path.join(meta_dir, "v0.json"), meta)
        _atomic_write_text(os.path.join(meta_dir, HINT), "0")
        return LakeTable(spark, path)

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, META_DIR, HINT))

    def _load_meta(self) -> dict:
        hint = os.path.join(self.path, META_DIR, HINT)
        with open(hint) as f:
            v = int(f.read().strip())
        with open(os.path.join(self.path, META_DIR, f"v{v}.json")) as f:
            return json.load(f)

    def refresh(self) -> None:
        self._meta = self._load_meta()

    @property
    def version(self) -> int:
        return self._meta["version"]

    @property
    def current_snapshot_id(self) -> int:
        return self._meta["current_snapshot_id"]

    @property
    def num_buckets(self) -> int:
        return self._meta["partition"]["num_buckets"]

    @property
    def bucket_key(self) -> str:
        return self._meta["partition"]["bucket_key"]

    def schema(self) -> TableSchema:
        return TableSchema.from_json(
            self._meta["schemas"][str(self._meta["current_schema_version"])]
        )

    def snapshots(self) -> list[dict]:
        return list(self._meta["snapshots"])

    def committed_epoch(self, source: str = "default") -> int:
        return int(self._meta["committed_epochs"].get(source, -1))

    # -- reads ---------------------------------------------------------------

    def bucket_expr(self, col):
        """Deterministic bucket id for a key column (matches write path)."""
        return F.pmod(F.xxhash64(col), F.lit(self.num_buckets)).cast("int")

    def read_buckets(self, buckets: list[int] | None = None, with_internal: bool = True) -> DataFrame:
        """Scan current snapshot, pruned to ``buckets`` (None = all).

        Directories are grouped by the schema version they were written
        with; each group is read with its own physical schema and aligned
        to the current table schema before the union (schema-on-read).
        """
        files = self._meta["files"]
        sel = {int(b): v for b, v in files.items() if buckets is None or int(b) in set(buckets)}
        schema = self.schema()
        internal = INTERNAL_COLS if with_internal else []
        if not sel:
            empty_schema = schema.to_struct()
            if with_internal:
                for c in INTERNAL_COLS:
                    empty_schema = empty_schema.add(c, _INTERNAL_TYPES[c])
            return self.spark.createDataFrame([], empty_schema)
        by_sv: dict[int, list[str]] = {}
        for b, entry in sel.items():
            by_sv.setdefault(entry["schema_version"], []).append(
                os.path.join(self.path, entry["path"])
            )
        parts = []
        for sv, paths in sorted(by_sv.items()):
            df = self.spark.read.parquet(*paths)
            part = align(df, schema, keep_extra=internal)
            # _bucket is a partition directory on disk, not a stored column —
            # recompute it (same deterministic expr as the write path)
            if with_internal and "_bucket" not in part.columns:
                part = part.withColumn("_bucket", self.bucket_expr(F.col(self.bucket_key)))
            parts.append(part)
        return reduce(lambda a, b: a.unionByName(b), parts)

    def snapshot_df(self) -> DataFrame:
        """Current logical table state: payload columns, tombstones filtered."""
        df = self.read_buckets(None, with_internal=True)
        return df.where(~F.coalesce(F.col("_tombstone"), F.lit(False))).select(
            *self.schema().names()
        )

    # -- schema evolution ------------------------------------------------------

    def evolve_schema(self, incoming: T.StructType) -> list[str]:
        """Widen/extend the table schema so ``incoming`` rows fit (no commit
        of data; bumps metadata version). Returns human-readable change log."""
        new_schema, changes = self.schema().evolve_to_accept(incoming)
        if not changes:
            return []
        meta = json.loads(json.dumps(self._meta))
        sv = meta["current_schema_version"] + 1
        meta["schemas"][str(sv)] = new_schema.to_json()
        meta["current_schema_version"] = sv
        self._commit_meta(meta)
        return changes

    # -- writes ----------------------------------------------------------------

    def write_snapshot_data(self, df: DataFrame, snapshot_id: int) -> str:
        """Write data files for a snapshot: partitioned by ``_bucket``.

        ``mode=overwrite`` makes a crash-replayed write of the same snapshot
        id self-cleaning (the orphan from the failed attempt is replaced).
        """
        rel = f"data/snap-{snapshot_id:08d}"
        out = os.path.join(self.path, rel)
        (
            df.repartition(F.col("_bucket"))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(out)
        )
        return rel

    def commit(
        self,
        epoch: int,
        source: str,
        snapshot_rel_path: str,
        dirty_buckets: list[int],
        stats: dict | None = None,
    ) -> int:
        """Atomically publish a snapshot: repoint dirty buckets, fence epoch."""
        meta = json.loads(json.dumps(self._meta))
        sid = meta["current_snapshot_id"] + 1
        sv = meta["current_schema_version"]
        for b in dirty_buckets:
            meta["files"][str(int(b))] = {
                "path": f"{snapshot_rel_path}/_bucket={int(b)}",
                "schema_version": sv,
            }
        meta["snapshots"].append(
            {
                "snapshot_id": sid,
                "epoch": epoch,
                "source": source,
                "committed_at": time.time(),
                "dirty_buckets": sorted(int(b) for b in dirty_buckets),
                "stats": stats or {},
            }
        )
        meta["current_snapshot_id"] = sid
        meta["committed_epochs"][source] = max(epoch, self.committed_epoch(source))
        self._commit_meta(meta)
        return sid

    def _commit_meta(self, meta: dict) -> None:
        new_v = meta["version"] + 1
        meta["version"] = new_v
        target = os.path.join(self.path, META_DIR, f"v{new_v}.json")
        if os.path.exists(target):
            raise ConcurrentCommitError(
                f"metadata version v{new_v} already exists — concurrent writer?"
            )
        _atomic_write_json(target, meta)
        _atomic_write_text(os.path.join(self.path, META_DIR, HINT), str(new_v))
        self._meta = meta


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _atomic_write_text(path: str, text: str) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(text)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)
