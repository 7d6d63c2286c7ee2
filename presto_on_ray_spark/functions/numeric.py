"""Deterministic numeric aggregation helpers.

Floating-point SUM is order-dependent; a distributed partial/final
aggregation (Spark) and a single-threaded scan (the DuckDB oracle) can
differ in the last ulps. The engine's convention for money-like doubles:
accumulate in DECIMAL (exact, associative, order-independent), surface
as double. Matches what Presto does for its DECIMAL type semantics
(SURVEY §1.2) and makes cross-engine value hashes reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Exact sum of a double column via decimal accumulation → double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Deterministic average: exact decimal sum, one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
        / F.count(c)
    )


# DuckDB-side equivalents (kept adjacent so both sides stay in sync):
#   dsum(x)  ->  CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE)
#   davg(x)  ->  CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE) / COUNT(x)
def oracle_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(30,{scale}))) AS DOUBLE)"


def oracle_davg(expr: str, scale: int = 2) -> str:
    return f"{oracle_dsum(expr, scale)} / COUNT({expr})"


# Exact-decimal money products. The dsum-of-a-double-product form
# rounds the PRODUCT once per row (double -> decimal(.,scale)), and
# that rounding disagrees between engines at representation half
# boundaries (Spark BigDecimal HALF_UP vs DuckDB scaled multiply) —
# caught by the sf1 differential sweep on Q1's sum_charge. These
# helpers instead cast the 2-dp-valued FACTORS to decimal (exact:
# the stored doubles sit on the 2-dp grid by construction) and
# multiply in decimal, so every intermediate is exactly on the
# result grid (2dp x 2dp = exact 4dp; x 2dp again = exact 6dp) and
# NO rounding event exists for the engines to disagree on, at any
# data scale.
def dec_price(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp-valued price column (< 10^10)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def dec_rate(col: Column | str) -> Column:
    """Exact decimal view of a 2-dp-valued rate column (< 100).
    Widths stay TIGHT on purpose: (1 - rate) widens to (5,2), so
    price(12,2) × (5,2) → (18,4), × (5,2) again → (24,6) — all under
    precision 38, so neither engine ever reduces scale (Spark's
    allowPrecisionLoss rounding above 38 was the residual sf1
    divergence with wide (18,2) factors, whose second product hits
    precision 43)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(4,2)")


def dec_revenue(ep: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """l_extendedprice * (1 - l_discount), exact 4-dp decimal."""
    return dec_price(ep) * (F.lit(1).cast("decimal(3,2)") - dec_rate(disc))


def dec_charge(ep: str = "l_extendedprice", disc: str = "l_discount",
               tax: str = "l_tax") -> Column:
    """revenue * (1 + l_tax), exact 6-dp decimal ((24,6) — see
    dec_rate's width note; keep the (3,2) literal width here and in
    dec_revenue in sync)."""
    return dec_revenue(ep, disc) * (F.lit(1).cast("decimal(3,2)") + dec_rate(tax))


def dsum_dec(product: Column, round_to: int = 2) -> Column:
    """Exact sum of an already-exact decimal product, rounded to
    ``round_to`` places ON THE DECIMAL, then cast to double.

    The round-first step is load-bearing: a scale-6 money sum's scaled
    integer exceeds 2^53 (2e10 dollars = 2e16 micro-units), where
    decimal→double conversion itself becomes engine-dependent (DuckDB's
    int→double-then-divide double-rounds; Spark's string parse rounds
    once) — measured as a 1-ulp sum_charge divergence on the sf1 sweep
    with bit-identical decimal sums. Rounding to cents first keeps the
    scaled integer < 2^53 for any sum below ~9e13 dollars, making the
    final cast a single correctly-rounded operation in both engines."""
    return F.round(F.sum(product), round_to).cast("double")


def oracle_dec_price(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(12,2))"


def oracle_dec_rate(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(4,2))"


def oracle_dec_revenue(ep: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return f"({oracle_dec_price(ep)} * (1 - {oracle_dec_rate(disc)}))"


def oracle_dsum_dec(product_expr: str, round_to: int = 2) -> str:
    return f"CAST(ROUND(SUM({product_expr}), {round_to}) AS DOUBLE)"
