"""Shared oracle-comparison helpers.

Local replica of the driver's correctness gate (see __spark_entry__.py):
row-count + column-set + order-insensitive value comparison between a
Spark result and a DuckDB oracle result, both as pandas frames. Used by
``tools/check_oracle.py`` and ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify object columns, sort rows by all
    columns — the driver compares order-insensitively."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Return a list of problems ([] = match)."""
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(
            f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
        )
        return problems
    s, o = normalize(sdf), normalize(odf)
    if len(s) == len(o):
        for c in s.columns:
            a, b = s[c], o[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.isna() & b.isna()) | (a == b)
                if not eq.all():
                    bad = (~eq).idxmax()
                    problems.append(
                        f"col {c}: first diff row {bad}: "
                        f"spark={a[bad]!r} oracle={b[bad]!r}"
                    )
            else:
                if not a.equals(b.astype(a.dtype) if a.dtype != b.dtype else b):
                    neq = a != b
                    bad = neq.idxmax()
                    problems.append(
                        f"col {c} dtype {a.dtype}/{b.dtype}: first diff row {bad}: "
                        f"spark={a[bad]!r} oracle={b[bad]!r}"
                    )
            if str(a.dtype) != str(b.dtype):
                problems.append(f"col {c} dtype spark={a.dtype} oracle={b.dtype}")
    return problems
