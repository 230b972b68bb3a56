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


def assert_pdf_equal(left: pd.DataFrame, right: pd.DataFrame, key_cols: list[str]):
    """Order-insensitive frame equality: sort by keys, normalize timestamps."""
    left = _normalize(left)[sorted(left.columns)]
    right = _normalize(right)[sorted(right.columns)]
    assert sorted(left.columns) == sorted(right.columns), (left.columns, right.columns)
    left = left.sort_values(key_cols, ignore_index=True)
    right = right.sort_values(key_cols, ignore_index=True)
    pd.testing.assert_frame_equal(left, right, check_dtype=False, check_exact=False, rtol=1e-9)
