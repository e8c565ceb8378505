"""Oracle-bind gate: every registered DuckDB oracle must at least BIND
(EXPLAIN, no execution) against the sf0.01 views.

Round 3 shipped 6 oracles whose CTE chain referenced a column from a
fragment that was never spliced in (VERDICT.md round 3, "What's wrong"
§1) — a class of breakage that costs a full round via the driver but
one pytest-second here. This runs in a few seconds for all ~120
oracles because EXPLAIN only plans."""

from __future__ import annotations

import pytest

from map_reduce_library_spark.queries import ORACLES
from conftest import SF_CORRECTNESS, duck_con


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_CORRECTNESS)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_binds(con, name):
    try:
        con.execute(f"EXPLAIN {ORACLES[name]}")
    except Exception as exc:  # binder/parser errors carry the cause
        raise AssertionError(f"oracle for {name!r} does not bind: {exc}") from exc
