"""Snapshot export: materialize the table's logical state for downstream
consumers (training-data readers, reconciliation dumps, the reference's
final-layer handoff to BI).

The north rule's correctness invariant is per-turn text equality under
STABLE ``(conv_id, turn_idx)`` ordering — this sink materializes exactly
that ordering at any scale: ``repartitionByRange`` over the key gives
totally-ordered partitions (a sampled range partitioner, one shuffle),
``sortWithinPartitions`` orders inside each, and part-file lexicographic
order preserves the global order for any reader that concatenates files
in name order. No single-task global sort, no driver collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from .lake.table import LakeTable


def export_snapshot(
    table: LakeTable,
    out_dir: str,
    fmt: str = "parquet",
    ordered: bool = True,
    ts_min=None,
    ts_max=None,
) -> dict:
    """Write the current snapshot (optionally time-pruned) to ``out_dir``.

    ``fmt``: parquet | csv | json. ``ordered=True`` produces the stable
    global (key) order described in the module doc; False keeps the
    table's bucket layout order (cheaper: no range shuffle).
    Returns {"rows": n, "files": k, "path": out_dir}.
    """
    df: DataFrame = table.snapshot_df(ts_min=ts_min, ts_max=ts_max)
    key = table.key_cols
    if ordered:
        df = df.repartitionByRange(*key).sortWithinPartitions(*key)
    # row count rides the write job as an Observation — no read-back scan,
    # and no AnalysisException on an empty json export (schema inference
    # over zero data files)
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("export_rows")
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, fmt)(out_dir)
    n = obs.get["n"]
    files = [
        f for f in os.listdir(out_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    ]
    return {"rows": int(n), "files": len(files), "path": out_dir}
