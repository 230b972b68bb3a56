"""Operator package; shared plumbing helpers."""

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    CPU-heavy per-row operators (shingling, min-hashing, vector math) are
    compute-bound, not scan-bound: a small parquet file arrives as ONE
    split and would serialize the whole operator onto a single core. The
    round-robin repartition costs one shuffle of the raw rows — trivial
    relative to the per-row compute that follows, and a no-op on inputs
    that already have enough splits (the 100 TB case).
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
