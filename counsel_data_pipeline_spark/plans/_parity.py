"""Cross-engine float-parity helpers.

The driver hashes result values, so a double aggregate must be bit-identical
between Spark and DuckDB. Floating-point addition is not associative; Spark
sums per-partition then merges, DuckDB sums in its own order — raw
``sum(double)`` WILL drift in the low bits and flip the hash.

Fix: aggregate in DECIMAL. Decimal arithmetic is exact, hence associative,
hence partition-order-independent; both engines then cast the identical
exact value to DOUBLE, which is a deterministic IEEE-754 conversion.

Averages: DuckDB's ``avg(decimal)`` returns a double computed internally, so
instead compute ``CAST(sum_decimal AS DOUBLE) / count`` on both sides —
identical inputs through identical IEEE ops.

One more trap: DECIMAL→DOUBLE conversion itself is only bit-reproducible
across engines when the decimal's unscaled value fits in 2^53 (then it's
one exact integer→double load plus one correctly-rounded division by a
power of ten). A scale-12 sum has a ~1e20 unscaled value and the engines
disagreed by 1 ulp. So: ROUND the exact decimal sum to a coarse scale
(money→2, ratios→6) before the double cast — rounding is exact decimal
arithmetic (half-away-from-zero in both engines), and the result converts
identically.

Rounding has its own trap: round(x, k) of an INTEGER-RATIO double is
tie-UNSAFE — a ratio of integers can equal the rounding grid's midpoint
exactly (sf0.1 classifier: -1039/16000 = -0.0649375) and the engines
split ties differently. Rule: a plain int/int (or int-cast) division is
already bit-identical across engines — output it RAW, never rounded.
Reserve round-to-6 for transcendental outputs (ln/exp/sqrt chains),
where exact grid ties have measure zero.

Integer sums have their own trap: DuckDB widens ``sum(int/bigint)`` to
HUGEINT (int128). A fetch path that materializes through pandas/Arrow
renders HUGEINT as float ("150.0") while Spark's bigint renders as int
("150") — same value, different canonical string, hash mismatch (this was
exactly the set of 9 driver-hash-red queries in round 1: every one had a
HUGEINT oracle column, no green one did). Oracle SQL must therefore wrap
every integer sum in ``CAST(... AS BIGINT)`` — use :func:`sql_bsum`. The
same applies to any UBIGINT/HUGEINT-producing expression in an oracle's
output columns.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Wide enough for sf up to ~10 on these tables: values ~1e5, rows ~1e8.
DEC = "decimal(30,6)"


def dec(col: str | Column) -> Column:
    """Cast a (double) column to the exact parity decimal type."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def to_double(sum_col: Column, scale: int = 2) -> Column:
    """Parity-safe decimal→double: round to coarse scale first (see above)."""
    return F.round(sum_col, scale).cast("double")


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Exact decimal sum, exposed as a reproducible DOUBLE."""
    return to_double(F.sum(dec(col)), scale).alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Parity-safe average: double(round(sum_decimal, 6)) / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (to_double(F.sum(dec(c)), 6) / F.count(c)).alias(alias)


def sql_dec(expr: str) -> str:
    """DuckDB-side cast matching dec()."""
    return f"CAST({expr} AS DECIMAL(30,6))"


def sql_to_double(sum_expr: str, scale: int = 2) -> str:
    return f"CAST(round({sum_expr}, {scale}) AS DOUBLE)"


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    return f"{sql_to_double(f'sum({sql_dec(expr)})', scale)} AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"({sql_to_double(f'sum({sql_dec(expr)})', 6)} / count({expr})) AS {alias}"


def sql_bsum(expr: str, alias: str) -> str:
    """Integer sum pinned to BIGINT (DuckDB widens to HUGEINT otherwise)."""
    return f"CAST(sum({expr}) AS BIGINT) AS {alias}"
