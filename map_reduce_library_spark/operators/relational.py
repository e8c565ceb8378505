"""Reusable relational building blocks with cross-engine determinism.

The reference expresses projection/filter/join/agg only implicitly
(inside user ``map``/``reduce`` callbacks — MapReduceClient.h:69,
SURVEY.md §2D); here they are first-class declarative operators so
Catalyst gets to push down, prune, reorder and broadcast.

Cross-engine determinism discipline (for the DuckDB oracle hash):
floating-point SUMs are order-dependent, and Spark's shuffle order is
nondeterministic. Every money/quantity aggregate therefore casts to
DECIMAL first (exact, order-independent), aggregates, and only then
casts back to DOUBLE (IEEE nearest — identical in any engine). AVG is
exact-sum / count, an IEEE double division, also deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Scale-2 is faithful for the testdata's price/quantity domains and
# leaves 16 integer digits — no overflow until ~1e16, fine at 100 TB
# (Spark widens the accumulator to decimal(28+,2) automatically).
MONEY = "decimal(18,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM: decimal accumulate, double result."""
    return F.sum(dec(col)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum / count of NON-NULL values
    (F.count(col), matching SQL AVG's null semantics — dividing by
    the row count diverges the moment the column is nullable;
    code-review r6), double division."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c)).cast("double") / F.count(c)).alias(alias)


def topk(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k. Spark plans orderBy+limit as TakeOrderedAndProject:
    a per-partition partial top-k then a single k-row merge on the
    driver — no global sort materialization, which is exactly the
    scale-safe plan for 100 TB (k rows cross the wire per partition).
    Callers must make ``order_cols`` a total order (tiebreak on a
    unique key) or the result is nondeterministic."""
    return df.orderBy(*order_cols).limit(k)
