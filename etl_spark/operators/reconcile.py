"""Cross-system reconciliation: tolerance-band compare between an
ingested external measure and a computed aggregate.

Reference analogue: the store-revenue reconciliation tests
(/root/reference/etl/dags/user_history/include/tests/store/itunes/
optional/store_itunes.yaml:1-53 — revenue from the iTunes report must be
within 5%/day of the warehouse-computed revenue) and the event-loss
tolerance test (include/tests/event_transformations/optional/
event_loss.yaml:52 — <=2% loss).

Scale shape: both sides are pre-aggregated to the compare keys before
the join, so the join is tiny (one row per key) regardless of input
size; at 100 TB the cost is the two aggregations, which are ordinary
partial-agg shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tolerance_compare(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_col: str,
    right_col: str,
    rel_tol: float,
) -> DataFrame:
    """FULL OUTER join two keyed measures and flag rows outside the band.

    ``rel_diff = |left - right| / max(|right|, eps)`` (right side is the
    trusted/computed measure, like the reference's warehouse revenue).
    A key missing on either side yields rel_diff NULL and
    ``within_tol = false`` — absence is a reconciliation failure, not a
    pass (mirrors the reference's mandatory-test treatment of empty
    partitions).
    """
    j = left.join(right, keys, "full_outer")
    l, r = F.col(left_col), F.col(right_col)
    rel = F.abs(l - r) / F.greatest(F.abs(r), F.lit(1e-12))
    return j.select(
        *keys,
        l.alias(left_col),
        r.alias(right_col),
        F.round(rel, 6).alias("rel_diff"),
        F.coalesce(rel <= F.lit(rel_tol), F.lit(False)).alias("within_tol"),
    )
