"""Oracle *type-portability* gate (VERDICT r4, next-round item 2).

The driver compares Spark vs DuckDB results through pandas. DuckDB
types outside the portable set silently change value representation on
the way through pandas and break the value hash even when every cell
is semantically identical — exactly what happened to
``source_lang_mix`` in round 4: a bare ``sum(n_chars)`` returned
HUGEINT (int128), pandas materialized it as float64 (``8570.0``), and
the driver hash diverged from Spark's bigint ``8570``.

This gate makes that bug class cost one pytest-second, like the
round-3 oracle-bind gate did for unbound oracles: every registered
oracle's output schema is resolved by DuckDB (lazily — relations bind
without executing) and each column type must recursively be in the
portable set. HUGEINT / UHUGEINT / DECIMAL fail with a "cast me"
message naming the query, the column, and the offending type.
"""

from __future__ import annotations

import duckdb
import pytest

from map_reduce_library_spark.queries import ORACLES
from map_reduce_library_spark.tables import TABLE_NAMES, table_path

SF = "/root/testdata/sf0.001"

# Types that survive DuckDB -> pandas -> driver canonicalization with
# the same value identity Spark produces. Integer widths below BIGINT
# are fine (the driver canonicalizes all ints identically); HUGEINT
# becomes float64 in pandas, DECIMAL becomes decimal.Decimal/object —
# both diverge from Spark's representation.
PORTABLE = {
    "BOOLEAN",
    "TINYINT",
    "SMALLINT",
    "INTEGER",
    "BIGINT",
    "UTINYINT",
    "USMALLINT",
    "UINTEGER",
    "FLOAT",
    "DOUBLE",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE",
    "BLOB",
}


def _check_type(qname: str, col: str, t) -> list[str]:
    """Validate a DuckDBPyType; return violation strings.

    NESTED TYPES ARE REJECTED OUTRIGHT, whatever the leaf type: the
    driver canonicalizes results through ``pandas.sort_values``, which
    raises ``TypeError: unhashable type: 'list'`` on any list/struct/
    map cell — so a nested OUTPUT column can never hash-verify. The
    round-4 version of this gate recursed into nested types and
    accepted portable leaves, and ``inverted_index_tokens``
    (``postings array<string>``) fell straight through it into a
    driver err in round 5 (VERDICT r5 item 2)."""
    tid = str(t.id).upper()
    if tid in ("LIST", "STRUCT", "MAP", "ARRAY"):
        return [
            f"{qname}.{col}: DuckDB type {t} is nested - the driver "
            f"canonicalizer cannot sort/hash list-valued cells; "
            f"array_join me (Spark F.array_join / DuckDB "
            f"array_to_string, or to_json for structs/maps)"
        ]
    if str(t).upper() in PORTABLE:
        return []
    return [
        f"{qname}.{col}: DuckDB type {t} is not pandas-portable - "
        f"cast me (e.g. CAST(... AS BIGINT) for HUGEINT sums, "
        f"CAST(... AS DOUBLE) for DECIMAL arithmetic)"
    ]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for name in TABLE_NAMES:
        c.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(SF, name)}')"
        )
    yield c
    c.close()


def test_every_oracle_output_type_is_portable(con):
    violations = []
    for qname, sql in sorted(ORACLES.items()):
        if sql is None:
            continue  # rows-only sketches carry no oracle by design
        try:
            rel = con.sql(sql)  # binds + resolves types lazily
        except Exception as exc:  # bind errors are the bind gate's job
            pytest.fail(f"{qname}: oracle failed to bind: {exc}")
        for col, typ in zip(rel.columns, rel.types):
            violations.extend(_check_type(qname, col, typ))
    assert not violations, "\n".join(violations)


def test_gate_catches_hugeint():
    """The gate must flag the exact round-4 failure shape."""
    c = duckdb.connect()
    rel = c.sql("SELECT sum(x) AS s FROM (SELECT CAST(1 AS BIGINT) x)")
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        bad.extend(_check_type("fixture", col, typ))
    assert bad and "HUGEINT" in bad[0]
    c.close()


def test_gate_catches_nested_list():
    """The gate must flag the exact round-5 failure shape: a
    list-typed output column with a perfectly portable leaf type
    (``inverted_index_tokens``'s old ``postings array<string>``)."""
    c = duckdb.connect()
    rel = c.sql("SELECT ['a', 'b'] AS postings")
    bad = []
    for col, typ in zip(rel.columns, rel.types):
        bad.extend(_check_type("fixture", col, typ))
    assert bad and "array_join me" in bad[0]
    c.close()
