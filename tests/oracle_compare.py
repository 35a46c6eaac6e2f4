"""Order-insensitive DataFrame comparison mirroring the driver's
spark-vs-duckdb correctness gate: row count + sorted column names +
canonicalized sorted-row multiset."""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd


def canon(v):
    # Ints and floats are tagged distinctly: the driver's value hash is
    # dtype-sensitive (DuckDB HUGEINT sums materialize as float64), so a
    # lenient 42 == 42.0 here would hide a real driver hash mismatch.
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon(x) for x in v)
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        return ("f", round(float(v), 6))
    if isinstance(v, decimal.Decimal):
        return ("f", round(float(v), 6))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return datetime.datetime(v.year, v.month, v.day).isoformat()
    return v


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rows = [tuple(canon(v) for v in row) for row in pdf.itertuples(index=False)]
    return sorted(rows, key=repr)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch spark={sorted(spark_pdf.columns)} "
        f"oracle={sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for i, (ra, rb) in enumerate(zip(a, b)):
        assert ra == rb, f"{name}: first differing row {i}:\n spark={ra}\noracle={rb}"
