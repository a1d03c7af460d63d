"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Compares row count, column names (sorted), and an order-insensitive value
hash computed from a canonical string rendering of every cell.
"""

from __future__ import annotations

import hashlib
import math
from decimal import Decimal


def _canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # full precision — mismatched float math must FAIL
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def frame_digest(df) -> tuple[int, list[str], str]:
    """(row_count, sorted column names, order-insensitive value hash)."""
    import pandas as pd

    assert isinstance(df, pd.DataFrame)
    cols = sorted(df.columns)
    rows = []
    for _, row in df[cols].iterrows():
        rows.append("|".join(_canon_cell(row[c]) for c in cols))
    rows.sort()
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    return len(df), cols, h


def _dtype_sig(df, col) -> str:
    """Comparable dtype signature; columns containing NULLs are exempt from
    width comparison (pandas silently widens nullable ints to float64)."""
    s = df[col]
    if s.isna().any():
        return "nullable"
    return str(s.dtype)


def compare(spark_df, duck_df) -> tuple[bool, str]:
    n1, c1, h1 = frame_digest(spark_df)
    n2, c2, h2 = frame_digest(duck_df)
    if n1 != n2:
        return False, f"row count {n1} != {n2}"
    if c1 != c2:
        return False, f"columns {c1} != {c2}"
    dt1 = [_dtype_sig(spark_df, c) for c in c1]
    dt2 = [_dtype_sig(duck_df, c) for c in c2]
    if dt1 != dt2:
        return False, f"dtypes {list(zip(c1, dt1, dt2))}"
    if h1 != h2:
        return False, f"value hash mismatch ({n1} rows)"
    return True, f"ok ({n1} rows)"
