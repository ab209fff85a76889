"""Deterministic numeric aggregation helpers.

Float SUMs are order-dependent (partition order differs run to run and
engine to engine) and ``ROUND`` on doubles disagrees between engines:
Spark rounds via the shortest-decimal string (Java ``BigDecimal.valueOf``)
while DuckDB rounds the binary value. Both problems vanish if the
arithmetic happens in the DECIMAL domain: decimal sums are exact and
order-independent, decimal rounding is exact, and the final
decimal->double cast is the same IEEE value in every engine.

So the engine's canonical "money math" is::

    CAST(ROUND(SUM(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)

mirrored verbatim in the oracle SQL. ``dsum``/``davg``/``dexpr`` build the
Spark side of that contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent SUM of a double column, rounded to `scale`."""
    return F.round(F.sum(dec(col)), scale).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """AVG as exact decimal sum / count, rounded in the decimal domain."""
    return F.round(F.sum(dec(col)) / F.count(F.col(col) if isinstance(col, str) else col), scale).cast("double")


def round2(col: Column, scale: int = 2) -> Column:
    return F.round(col, scale).cast("double")
