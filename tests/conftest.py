import pandas as pd
import pytest

from etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etl_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            if getattr(out[c].dt, "tz", None) is not None:
                out[c] = out[c].dt.tz_localize(None)
            out[c] = out[c].astype("datetime64[us]")
    return out


def stringify(pdf: pd.DataFrame) -> pd.DataFrame:
    """Mirror of the driver's hash input: every cell rendered with str().

    The driver value-hashes str(cell) over name-sorted columns, so a DuckDB
    HUGEINT that lands in pandas as float64 renders '9402.0' where Spark's
    bigint renders '9402' — a real gate failure that tolerance-based
    comparison (check_dtype=False) silently masks. Keeping this exact is
    what makes the local gate predict the driver gate.
    """
    def cell(v):
        try:
            isna = bool(pd.isna(v))
        except (TypeError, ValueError):  # array-like cell
            isna = False
        if isna:
            return "<null>"
        if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0):
            return str([str(x) for x in v])
        return str(v)

    out = pdf.copy()
    for c in out.columns:
        out[c] = out[c].map(cell)
    return out


def assert_pdf_equal(left: pd.DataFrame, right: pd.DataFrame, key_cols: list[str]):
    """Order-insensitive, driver-strict frame equality.

    Stringifies every cell (the driver's hash semantics), then sorts rows
    by ALL columns — a multiset comparison that no tie in a key-column
    prefix can break (sorting by ``key_cols`` alone false-failed queries
    whose first few name-sorted columns aren't a unique key). Stringify
    BEFORE sorting also makes array cells sortable. Timestamps are
    normalized to tz-naive datetime64[us] first since parquet round-trips
    differ only in tz annotation between Spark and DuckDB. ``key_cols`` is
    kept for call-site readability but no longer narrows the sort.
    """
    left = stringify(_normalize(left)[sorted(left.columns)])
    right = stringify(_normalize(right)[sorted(right.columns)])
    assert list(left.columns) == list(right.columns), (left.columns, right.columns)
    cols = list(left.columns)
    left = left.sort_values(cols, ignore_index=True)
    right = right.sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(left, right)
