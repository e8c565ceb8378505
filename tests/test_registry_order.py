"""Registry ordering: the driver checks queries in registration order
with a cap, so unverified (red or never-checked) queries MUST precede
already-green ones, and _VERIFIED must be derived from the committed
CORRECTNESS_r*.json artifacts rather than hand-maintained."""

from __future__ import annotations

import json
from pathlib import Path

from map_reduce_library_spark import queries as q

REPO = Path(__file__).resolve().parents[1]


def _artifact_status() -> dict[str, bool]:
    latest: dict[str, bool] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rows = json.loads(path.read_text())
        for name, r in rows.items():
            latest[name] = (
                not r.get("err")
                and bool(r.get("rows_match"))
                and bool(r.get("schema_match"))
                and r.get("hash_match") is not False
            )
    return latest


def test_verified_derived_from_artifacts():
    status = _artifact_status()
    assert q._VERIFIED == {n for n, green in status.items() if green}


def test_latest_round_wins():
    """A red row in a later round must evict an earlier green."""
    status = _artifact_status()
    for name, green in status.items():
        assert (name in q._VERIFIED) == green


def test_unverified_before_verified():
    order = list(q.QUERIES)
    idx = {name: i for i, name in enumerate(order)}
    unverified = [n for n in order if n not in q._VERIFIED]
    verified = [n for n in order if n in q._VERIFIED]
    if unverified and verified:
        assert max(idx[n] for n in unverified) < min(idx[n] for n in verified), (
            "every unverified query must precede every verified one"
        )


def test_oracled_before_rows_only_within_unverified():
    order = [n for n in q.QUERIES if n not in q._VERIFIED]
    seen_rows_only = False
    for name in order:
        if name not in q.ORACLES:
            seen_rows_only = True
        else:
            assert not seen_rows_only, (
                f"oracled unverified query {name!r} ordered after a "
                "rows-only one"
            )


def test_canaries_lead_verified_recheck_block():
    verified_order = [n for n in q.QUERIES if n in q._VERIFIED]
    present = [c for c in q._CANARIES if c in q._VERIFIED]
    assert verified_order[: len(present)] == present


def test_reds_in_latest_artifact_are_rechecked_first():
    """Any query red in its most recent driver row sits inside the
    first 50 registry positions (the driver's per-round check cap)."""
    status = _artifact_status()
    order = list(q.QUERIES)
    for name, green in status.items():
        if not green and name in order:
            assert order.index(name) < 50, (
                f"red query {name!r} outside the driver's 50-cap window"
            )
