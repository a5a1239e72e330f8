"""Exact-integer-unit money aggregation, shared by every revenue query.

THE TRAP (CORRECTNESS post-mortems q11 round 5, q9 round 7): TPC-H money
columns sit on an exact 2-dp grid, so ``l_extendedprice * (1-l_discount)``
lies on an exact 1e-4 grid and per-group sums land EXACTLY on .005
midpoints — where the double SUM's accumulation ORDER (Spark partial
aggregation vs DuckDB scan order) decides which side ``round(x, 2)``
falls on. q9 was green at sf0.01 and one cent off in three groups at
sf0.1. Every ``round(sum(<grid product>), 2)`` site is latently exposed.

THE FIX: sum EXACT INTEGER grid units (bigint; DECIMAL(38,0) ↔ DuckDB
HUGEINT where per-row units can overflow under 100 TB row counts), round
HALF-UP to cents in INTEGER space (``div`` / ``//`` — portable), and
divide by 100.0 once at the end. Addition of integers is associative, so
no accumulation order can perturb the result on either engine.

Grids (verified against the driver testdata): l_extendedprice,
l_discount, l_tax, o_totalprice = 2 dp; l_quantity integer. Money is
non-negative in this schema, which the ``+ half`` half-up trick assumes.

Spark/DuckDB portability notes (see the float-parity memory rules):
``round(x)`` to integer then an int cast is exact on both engines because
the scaled value is within ~1e-7 of an integer; the final ``/ 100.0``
uses ``cast(... as double)`` first so no DECIMAL literal typing leaks in.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# exact 1e-4-grid units of l_extendedprice * (1 - l_discount): cents × tenths
# (price_cents ≤ ~1.1e7, (1-disc)_cents ≤ 100 → ≤ ~1.1e9 per row; an int64
# group sum holds ~8e9 such rows — far past any single group at 100 TB)
REV_UNITS_SPARK = (
    "cast(round(l_extendedprice * 100) as bigint)"
    " * cast(round((1 - l_discount) * 100) as bigint)"
)
REV_UNITS_DUCK = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
)

# exact 1e-4-grid units of l_extendedprice * l_discount (Q6's forecast sum)
DISC_REV_UNITS_SPARK = (
    "cast(round(l_extendedprice * 100) as bigint)"
    " * cast(round(l_discount * 100) as bigint)"
)
DISC_REV_UNITS_DUCK = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round(l_discount * 100) AS BIGINT)"
)

# exact 1e-6-grid units of price * (1-disc) * (1+tax) (Q1's charge): ≤ ~1.2e11
# per row — still int64 per row, but a 100 TB-scale GROUP sum would pass
# 9.2e18, so the SUM widens to DECIMAL(38,0) (DuckDB sums BIGINT into
# HUGEINT natively)
CHARGE_UNITS_SPARK = (
    "cast(round(l_extendedprice * 100) as bigint)"
    " * cast(round((1 - l_discount) * 100) as bigint)"
    " * cast(round((1 + l_tax) * 100) as bigint)"
)
CHARGE_UNITS_DUCK = (
    "CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * CAST(round((1 - l_discount) * 100) AS BIGINT)"
    " * CAST(round((1 + l_tax) * 100) AS BIGINT)"
)


def sum_units_2dp(units_expr: str, scale_pow10: int) -> Column:
    """Spark column: Σ units (exact ints on a 10^-scale grid) → half-up to
    cents in integer space → double dollars."""
    half = 10 ** (scale_pow10 - 2) // 2
    div = 10 ** (scale_pow10 - 2)
    return F.expr(
        f"cast((sum({units_expr}) + {half}) div {div} as double)"
        " / cast(100 as double)"
    )


def sum_units_2dp_sql(units_expr: str, scale_pow10: int) -> str:
    """The DuckDB mirror of :func:`sum_units_2dp` (same integer half-up)."""
    half = 10 ** (scale_pow10 - 2) // 2
    div = 10 ** (scale_pow10 - 2)
    return (
        f"CAST((sum({units_expr}) + {half}) // {div} AS DOUBLE)"
        " / CAST(100 AS DOUBLE)"
    )


def sum_charge_2dp() -> Column:
    """Q1's 1e-6-grid charge sum: per-row int64 units, DECIMAL(38,0) sum
    (exact far past 100 TB), half-up to cents, double dollars. ``div`` on
    DECIMAL returns BIGINT — total cents ≤ ~1e17 at 100 TB, in range."""
    return F.expr(
        f"cast((sum(cast({CHARGE_UNITS_SPARK} as decimal(38,0))) + 5000)"
        " div 10000 as double) / cast(100 as double)"
    )


SUM_CHARGE_2DP_SQL = (
    f"CAST((sum({CHARGE_UNITS_DUCK}) + 5000) // 10000 AS DOUBLE)"
    " / CAST(100 AS DOUBLE)"
)


def rev_sum_2dp() -> Column:
    """Σ revenue = price×(1−disc), exact units, half-up cents, double."""
    return sum_units_2dp(REV_UNITS_SPARK, 4)


REV_SUM_2DP_SQL = sum_units_2dp_sql(REV_UNITS_DUCK, 4)

DISC_REV_SUM_2DP_SQL = sum_units_2dp_sql(DISC_REV_UNITS_DUCK, 4)


def cents_sum_2dp(col: str) -> Column:
    """Σ of a 2-dp money COLUMN (o_totalprice, l_extendedprice, c_acctbal)
    as exact integer cents → double dollars. No rounding step needed: cents
    are already the output grid."""
    return F.expr(
        f"cast(sum(cast(round({col} * 100) as bigint)) as double)"
        " / cast(100 as double)"
    )


def cents_sum_2dp_sql(col: str) -> str:
    return (
        f"CAST(sum(CAST(round({col} * 100) AS BIGINT)) AS DOUBLE)"
        " / CAST(100 AS DOUBLE)"
    )
