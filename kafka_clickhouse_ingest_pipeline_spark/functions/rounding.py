"""Engine-portable 4-decimal rounding.

Spark's round() goes through BigDecimal on the double's shortest decimal
representation (HALF_UP), DuckDB rounds the raw binary double — on an exact
.xxxx5 tie they disagree (observed: 0.78375 → 0.7838 vs 0.7837). floor(x*1e4 + 0.5 + 1e-6)/1e4 is pure double arithmetic, identical across
engines; the 1e-6 epsilon additionally absorbs last-ulp differences from
aggregation-order divergence (Spark partial-agg merge vs sequential sums)
that would otherwise flip a floor right at the boundary. 1e-6 on the
scaled value is far above ulp noise (~1e-10) and far below the 1e-4
resolution being kept.

Plain ROUND stays fine for values that are *sums/averages of data* where a
tie is measure-zero; use round4 for derived ratios/scores built from small
integer arithmetic, which land on ties all the time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round4(col: Column) -> Column:
    return F.floor(col * F.lit(10000.0) + F.lit(0.5) + F.lit(1e-6)) / F.lit(10000.0)


def round4_sql(expr: str) -> str:
    return f"(FLOOR(({expr}) * 10000.0 + 0.5 + 0.000001) / 10000.0)"
