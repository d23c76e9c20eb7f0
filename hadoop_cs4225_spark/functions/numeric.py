"""Cross-engine-stable floating aggregates.

Raw double SUM/AVG/STDDEV differ between Spark and DuckDB in the last
ulp because summation order (partial aggregation, SIMD) reassociates
floating addition. The driver's value-hash is exact, so every float
aggregate must be *identical* on both sides.

Policy: round each SUM once (that single round absorbs the ulp noise —
empirically stable at 2 decimals for money-scale values), then derive
avg/stddev from the rounded sums with plain IEEE arithmetic, which is
bit-deterministic across engines for identical inputs. Never round an
engine-computed AVG/STDDEV directly — its quantization step can sit on
a rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rsum(col: Column | str, scale: int = 2) -> Column:
    """Rounded SUM — the only place cross-engine noise is absorbed.

    The trailing ``+ 0.0`` normalizes signed zero: DuckDB's ROUND
    preserves the sign of a tiny negative (``round(-0.001, 2)`` =
    ``-0.0``) where Spark returns ``0.0``, and the driver's pandas
    value-hash distinguishes the two BIT PATTERNS. ``-0.0 + 0.0`` is
    ``+0.0`` in IEEE and a no-op for every other value, so adding it on
    both sides (see :func:`rsum_sql`) makes negative-capable sums safe.
    Inline ``ROUND(SUM(...))`` in oracle strings is only safe for
    provably non-negative quantities (prices, counts, the events
    ``value`` column) — use these helpers when the domain can go
    negative. Pinned in tests/test_numeric_parity.py.
    """
    return F.round(F.sum(col), scale) + 0.0


def rsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB twin of :func:`rsum` (signed-zero-normalized)."""
    return f"(ROUND(SUM({expr}), {scale}) + 0.0)"


def ravg(col: Column | str, scale: int = 6, sum_scale: int = 2) -> Column:
    """AVG as quant(round(sum, s)/count, scale): deterministic both sides.

    The outer step MUST be the floor-quantizer, not round: divisions by
    powers of two terminate exactly on decimal half-boundaries (e.g.
    sum/32 = 65.6534375) where the engines' round() implementations
    disagree. quant of an identical double is identical.
    """
    return quant(rsum(col, sum_scale) / F.count(F.lit(1)), scale)


def rstddev(col: Column | str, scale: int = 4, sum_scale: int = 2) -> Column:
    """Sample stddev from rounded sum and rounded sum-of-squares."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(F.lit(1)).cast("double")
    s1 = rsum(c, sum_scale)
    s2 = F.round(F.sum(c * c), sum_scale)
    return quant(F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0))), scale)


def quant(col: Column | str, scale: int = 2) -> Column:
    """Deterministic cross-engine quantizer: ``floor(x*10^s + 0.5)/10^s``.

    Use instead of ``round`` on *computed* doubles (divisions, sqrt/ln)
    whose decimal expansion can sit exactly on a ``.xx5`` boundary:
    Spark rounds via the exact binary expansion (BigDecimal HALF_UP),
    DuckDB via scaled multiply — they disagree on boundaries. floor/mul/
    add are IEEE-deterministic, so identical inputs give identical
    outputs in both engines. (Half-values round toward +inf, also for
    negatives — consistent, slightly different from HALF_UP there.)

    Magnitude guard (same branch in :func:`quant_sql`): for
    ``|x| >= 2^53/10^s`` the value passes through UNQUANTIZED. Above
    that, the double grid spacing is >= 1/10^s, so there is no
    sub-quantum fraction to remove — and the floor formula itself
    diverges between engines there: Spark's ``floor`` returns LONG and
    silently clamps at 2^63 (turning 2^52 into 922337203685477.6 at
    scale 4), while DuckDB's stays double; the tie-to-even of ``+ 0.5``
    at grid spacing exactly 1 also differs from the small-value
    behavior. The guard keeps the quantizer total, exact, and
    bit-identical across engines on every double
    (tests/test_numeric_parity.py hits the cliffs on purpose).
    """
    c = F.col(col) if isinstance(col, str) else col
    p = float(10**scale)
    lim = (2.0**53) / p
    return F.when(F.abs(c) >= lim, c).otherwise(F.floor(c * p + 0.5) / p)


def quant_sql(expr: str, scale: int = 2) -> str:
    p = float(10**scale)
    lim = (2.0**53) / p
    return (
        f"(CASE WHEN abs({expr}) >= {lim} THEN ({expr}) "
        f"ELSE (floor(({expr}) * {p} + 0.5) / {p}) END)"
    )


def ravg_sql(expr: str, scale: int = 6, sum_scale: int = 2) -> str:
    return quant_sql(f"ROUND(SUM({expr}), {sum_scale}) / COUNT(*)", scale)


def rstddev_sql(expr: str, scale: int = 4, sum_scale: int = 2) -> str:
    s1 = f"ROUND(SUM({expr}), {sum_scale})"
    s2 = f"ROUND(SUM(({expr}) * ({expr})), {sum_scale})"
    return quant_sql(
        f"SQRT(({s2} - {s1} * {s1} / COUNT(*)) / (COUNT(*) - 1.0))", scale
    )
