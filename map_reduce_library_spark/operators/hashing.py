"""THE 60-bit md5-prefix hash — single definition for every operator
that derives deterministic cross-engine uniform values.

Why this exact shape everywhere: md5 is the one hash both engines
spell identically; 15 hex chars = 60 bits parses into a BIGINT with
headroom in both (no sign bit, no overflow under ``% m`` or modular
arithmetic with 31-bit multipliers); and keeping ONE definition means
a width/encoding tweak cannot silently desynchronize the operators
from each other or from their DuckDB oracle twins (code-review r7 —
the expression had been hand-copied into pipeline/dedup/cms/
manifests).

DuckDB twin (byte-equivalent), for oracle SQL:

    ('0x' || substr(md5(<expr>), 1, 15))::BIGINT

Spark SQL-string twin (for operators that build expr strings, e.g.
``operators/cdc.py``):

    cast(conv(substring(md5(<expr>), 1, 15), 16, 10) as bigint)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix60(c: Column) -> Column:
    """BIGINT in [0, 2^60): the top 15 hex chars of md5(c), base-16
    parsed. Input must already be a string Column (cast/concat salts
    at the call site — salting policy lives with each operator)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
