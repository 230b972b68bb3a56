"""Approximate-aggregate sketches for 100-TB profiling passes.

At 10^10 rows, exact COUNT(DISTINCT) and exact percentiles are the two
aggregations whose shuffle cost explodes (exact distinct = full repartition
of every distinct value; exact percentile = global sort or collect). The
sketch versions are one-pass, mergeable, fixed-size states — the only
sane default for corpus profiling (docs per domain, token-count
distributions) at training-data scale:

  * ``approx_count_distinct`` — HyperLogLog++ (Spark built-in, JVM-side,
    mergeable partial aggregates; rsd configurable).
  * ``percentile_approx``     — Greenwald-Khanna/KLL-style quantile
    summary (Spark built-in, same mergeability).

Both are deterministic for a fixed input and implementation, so their
error CONTRACT is testable: the driver-gate query emits exact values
alongside boolean ``*_ok`` flags asserting the sketch landed within its
error band; the DuckDB oracle states the exact values and ``TRUE``.

Reference parity: the reference has no approximate aggregates (BigQuery
APPROX_* never appears) — engine-new surface for the scale mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_profile(
    df: DataFrame, key: str, value: str, rsd: float = 0.05
) -> DataFrame:
    """Per-``key`` cardinality profile: exact distinct (the verify stage),
    HLL estimate, and whether the estimate honors ~3×rsd (HLL++'s rsd is
    a standard deviation; 3σ is the practical containment band)."""
    return df.groupBy(key).agg(
        F.countDistinct(value).alias("n_exact"),
        F.approx_count_distinct(value, rsd=rsd).alias("n_approx"),
    ).select(
        key,
        "n_exact",
        (
            (F.abs(F.col("n_approx") - F.col("n_exact"))
             <= 3 * rsd * F.col("n_exact") + F.lit(1))
        ).alias("hll_ok"),
    )


def quantile_profile(
    df: DataFrame, key: str, value: str, accuracy: int = 10_000
) -> DataFrame:
    """Per-``key`` quantile profile with the sketch's ACTUAL guarantee
    checked: Greenwald-Khanna promises the returned element's rank is
    within ``n/accuracy`` of the target rank (a RANK bound, not a value
    bound — the returned element is a real data point, so comparing its
    value against an interpolated exact percentile misfires on small or
    gappy groups). We re-rank the sketch's answers against the data in a
    second cheap pass (broadcast of one row per group) and flag whether
    the tie-range ``[count(<v)+1, count(<=v)]`` intersects the allowed
    rank window. Exact interpolated p50/p95 ride along for the oracle."""
    pct = F.expr(f"percentile_approx({value}, array(0.5, 0.95), {accuracy})")
    exact = F.expr(f"percentile({value}, array(0.5, 0.95))")
    g = df.groupBy(key).agg(pct.alias("_a"), exact.alias("_e"))
    j = df.join(F.broadcast(g.select(key, "_a")), key)
    v = F.col(value)
    ranks = j.groupBy(key).agg(
        # count(value), not count(*): percentile/percentile_approx and the
        # rank sums all skip NULLs — a NULL-inclusive rank base would
        # misflag perfectly correct sketches on NULL-carrying groups
        F.count(v).alias("_n"),
        *[agg.alias(name) for name, agg in {
            "_lo50": F.sum((v < F.col("_a")[0]).cast("long")),
            "_hi50": F.sum((v <= F.col("_a")[0]).cast("long")),
            "_lo95": F.sum((v < F.col("_a")[1]).cast("long")),
            "_hi95": F.sum((v <= F.col("_a")[1]).cast("long")),
        }.items()],
    )
    out = g.join(ranks, key)
    n = F.col("_n")

    def ok(p, lo, hi):
        slack = n / accuracy + F.lit(1.0)  # rank tolerance + 1-row slop
        target = p * n
        return (F.col(lo) + 1 <= target + slack) & (F.col(hi) >= target - slack)

    return out.select(
        key,
        F.round(F.col("_e")[0], 3).alias("p50_exact"),
        F.round(F.col("_e")[1], 3).alias("p95_exact"),
        ok(F.lit(0.5), "_lo50", "_hi50").alias("p50_ok"),
        ok(F.lit(0.95), "_lo95", "_hi95").alias("p95_ok"),
    )
