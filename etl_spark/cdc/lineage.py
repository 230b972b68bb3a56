"""Per-batch lineage + metrics log (north rule S16).

One record per applied micro-batch: (source, epoch, source offset range
[lsn_min, lsn_max], rows_in, winners, dirty buckets, LakeTable snapshot id,
wall seconds, events/sec, max lag seconds). Written as JSONL next to the
table (driver-side, tiny — one row per commit), readable back as a
DataFrame for monitoring queries.

Reference analogue: the freshness PUT after each day's commit
(/root/reference/etl/lib/datasource.py:22-24, wired at
/root/reference/etl/dags/user_history/DAG_user_history.py:109-112).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class LineageLog:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def record(self, row: dict) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(row, default=str) + "\n")
            f.flush()
            os.fsync(f.fileno())

    def rows(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def to_df(self, spark: SparkSession) -> DataFrame:
        rows = self.rows()
        if not rows:
            raise ValueError("empty lineage log")
        return spark.createDataFrame(rows)
