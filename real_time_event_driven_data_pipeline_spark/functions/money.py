"""Deterministic money/ratio arithmetic.

The reference rounds money and rates with ``round(x, 2)`` on floats
(reference: docker-images/transformation/transform.py:113-117,138-142).
Rounding a float whose true value sits exactly on a half-cent boundary
is engine-dependent (JVM BigDecimal.valueOf rounds the shortest decimal
repr half-up; C engines round the raw binary), so cross-engine value
hashes flake.  For 2-dp money inputs we instead compute ratios in
EXACT integer cents and round half-up with integer division — the same
bits in any engine:

    round_half_up(C / n) cents  ==  (2*C + n) DIV (2*n)   (C, n > 0)

Plain SUMs of 2-dp money stay as ``round(sum, 2)``: the true sum has
exactly 2 decimals, so FP noise (~1e-9) can never reach a boundary.

These are all built-in JVM expressions — no UDFs, fully codegen'd, and
the integer forms are cheaper than decimal arithmetic at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2-dp money column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


# Note on determinism: long/long division below goes through IEEE-754
# double division, which is *correctly rounded* and therefore produces
# identical bits in every engine for identical integer operands (< 2^53,
# comfortably true for cents-at-group-granularity even at 100 TB).
# FLOOR of that quotient is thus engine-independent.


def avg_money_2dp(sum_cents: Column, count: Column) -> Column:
    """AVG of 2-dp money, rounded half-up to 2 dp, exact in integers.

    floor((2C + n) / 2n) == round_half_up(C/n) for positive ints.
    """
    return F.floor((sum_cents * 2 + count) / (count * 2)) / F.lit(100.0)


def pct_2dp(numer: Column, denom: Column) -> Column:
    """100*numer/denom as a 2-dp percentage, exact integer rounding."""
    return F.floor((numer * 20000 + denom) / (denom * 2)) / F.lit(100.0)


def round2_sum(col: Column | str) -> Column:
    """SUM of 2-dp money rounded back to 2 dp (boundary-safe, see above)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c), 2)


# DuckDB oracle twins (for reference when writing oracle SQL):
#   cents:        SUM(CAST(ROUND(x * 100) AS BIGINT))
#   avg_money:    CAST(FLOOR((2*C + n) / (2*n)) AS BIGINT) / 100.0
#   pct:          CAST(FLOOR((20000*r + n) / (2*n)) AS BIGINT) / 100.0
