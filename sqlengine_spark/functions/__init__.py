"""Cross-engine-deterministic scalar helpers (SURVEY §5.4 float policy).

These are thin Column-expression builders — they stay inside Catalyst /
whole-stage codegen (no UDFs).
"""

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column, scale: int = 2) -> Column:
    """Round a double to ``scale`` digits with DuckDB-identical semantics.

    Spark's ``F.round(x, n)`` converts the double to exact BigDecimal and
    half-up-rounds that, while DuckDB rounds ``x * 10^n`` in double
    arithmetic. For values whose binary representation sits just below a
    .5 boundary the two disagree (measured: 118/60 000 mismatches on
    lineitem net-price at sf0.01). ``round(x * 10^n) / 10^n`` — scaling
    first, rounding to integer, scaling back — reproduces DuckDB's result
    bit-for-bit (measured: 0/60 000 mismatches).

    Negative zero: a value that rounds to zero from below yields -0.0,
    which pandas-side canonicalizers format as "-0.0" != "0.0" (measured
    at sf0.1 on z-scores). Adding +0.0 maps -0.0 to +0.0 (IEEE) and is
    exact for every other double; oracles whose per-row values straddle
    zero must add ``+ 0`` likewise.
    """
    factor = float(10**scale)
    return F.round(col * factor, 0) / factor + F.lit(0.0)


def vdot(a: Column, b: Column) -> Column:
    """Dot product of two float-array columns, computed entirely in
    DOUBLE with a sequential left-fold.

    Precision pin: the embeddings are float32; multiplying in float32
    drifts ~1e-6 from an engine that promotes first, which is at the
    6-dp rounding boundary. Casting each element to double BEFORE the
    multiply and folding sequentially (Spark ``aggregate`` ≡ DuckDB
    ``SUM`` over an ordered ``generate_series`` unnest) makes both
    engines produce bit-identical doubles. Stays JVM-side — no UDF.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)
