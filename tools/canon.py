"""Driver-faithful result canonicalization, shared by the local oracle gate
(`tools/check_oracle.py`) and the pytest parity asserts (`tests/conftest.py`).

The driver compares Spark and DuckDB results AFTER materializing both through
pandas, then hashes dtype-faithful values. Two consequences the round-1 local
gate missed (CORRECTNESS_r01 post-mortem):

1. DuckDB `sum()` over integers returns HUGEINT, which pandas materializes as
   float64 — so ``99111.0`` hashes differently from Spark's int64 ``99111``
   even though the values are "equal". A gate that formats through ``%.9g``
   (round 1) collapses exactly that difference and over-predicts green.
2. pandas hashing raises ``TypeError: unhashable type`` on list/dict cells, so
   an ``array<float>`` output column crashes even the rows-only check.

This module therefore (a) goes through pandas on both sides, (b) keeps the
concrete Python type in the canonical value (``int:99111`` vs
``float:99111.0``), and (c) probes hashability up front so unhashable columns
fail locally before the driver sees them.
"""

from __future__ import annotations

import math

import pandas as pd


def canon_cell(v) -> str:
    """Dtype-faithful canonical string: type tag + repr-level value."""
    if v is None:
        return "<null>"
    # bool before int: bool is an int subclass
    if isinstance(v, bool):
        return f"bool:{v!r}"
    if isinstance(v, float):
        return "float:NaN" if math.isnan(v) else f"float:{v!r}"
    if isinstance(v, int):
        return f"int:{v!r}"
    if isinstance(v, pd.Timestamp):
        return f"ts:{v.isoformat()}"
    return f"{type(v).__name__}:{v!r}"


def assert_hashable(pdf: pd.DataFrame) -> None:
    """Raise TypeError if any column holds unhashable cells — the same crash
    the driver's canonicalizer hits (multimodal_features, round 1)."""
    for c in pdf.columns:
        pd.util.hash_pandas_object(pdf[c], index=False)


def canon_rows(pdf: pd.DataFrame) -> list[tuple[str, ...]]:
    """Column-name-sorted, order-insensitive, dtype-faithful row multiset.

    ``Series.tolist()`` converts numpy scalars to Python scalars per-column,
    so an int64 column yields ``int`` cells and a float64 column ``float``
    cells — preserving exactly the distinction the driver's hash sees.
    """
    assert_hashable(pdf)
    cols = sorted(pdf.columns)
    col_lists = [pdf[c].tolist() for c in cols]
    return sorted(tuple(canon_cell(v) for v in row) for row in zip(*col_lists))
