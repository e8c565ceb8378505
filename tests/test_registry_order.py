"""Registry ordering: the driver checks queries in registration order
with a cap, so unverified (red, never-checked, or STALE — oracle or
querydef edited since last green) queries MUST precede already-green
ones, and _VERIFIED must be derived from the committed
VERIFIED_LEDGER.json (built by tools/update_ledger.py from the
CORRECTNESS_r*.json artifacts) rather than hand-maintained."""

from __future__ import annotations

import hashlib
import inspect
import json
from pathlib import Path

from map_reduce_library_spark import queries as q

REPO = Path(__file__).resolve().parents[1]


def _md5(text: str) -> str:
    return hashlib.md5(text.encode()).hexdigest()


def test_verified_subset_of_ledger_and_hash_validated():
    ledger = json.loads((REPO / "VERIFIED_LEDGER.json").read_text())
    for name, rnd in q._VERIFIED.items():
        entry = ledger[name]
        assert entry["round"] == rnd
        oracle = q.ORACLES.get(name)
        assert entry["oracle_md5"] == (None if oracle is None else _md5(oracle))
        assert entry["fn_md5"] == _md5(inspect.getsource(q.QUERIES[name]))


def test_stale_entries_are_demoted():
    """A ledger entry whose recorded oracle hash no longer matches the
    current oracle must NOT count verified (the round-3 blind spot)."""
    ledger = json.loads((REPO / "VERIFIED_LEDGER.json").read_text())
    for name, entry in ledger.items():
        if name not in q.QUERIES:
            continue
        oracle = q.ORACLES.get(name)
        current = None if oracle is None else _md5(oracle)
        if entry.get("oracle_md5") != current:
            assert name not in q._VERIFIED, (
                f"{name!r} counts verified despite a changed oracle"
            )


def test_later_red_evicts_earlier_green(tmp_path, monkeypatch):
    """tools/update_ledger.py: a red row in round N+1 must remove the
    ledger entry a green row in round N created (ADVICE round 3: the
    old tests never constructed this scenario)."""
    import tools.update_ledger as ul

    monkeypatch.setattr(ul, "REPO", tmp_path)
    green = {"rows_match": True, "schema_match": True,
             "hash_match": True, "spark_rows": 5, "err": None}
    red = dict(green, hash_match=False)
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"qx": green}))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({"qx": red}))

    def fake_registry(_source):
        def qx():
            return None

        return {"qx": qx}, {"qx": "SELECT 1"}

    monkeypatch.setattr(ul, "_registry", fake_registry)
    ledger = ul.update(1, tmp_path)
    assert "qx" in ledger and ledger["qx"]["round"] == 1
    ledger = ul.update(2, tmp_path)
    assert "qx" not in ledger


def test_rows_only_green_counts_verified(tmp_path, monkeypatch):
    """err == 'no_oracle' with rows recorded is as green as that query
    can ever get; it must enter the ledger (ADVICE round 3)."""
    import tools.update_ledger as ul

    monkeypatch.setattr(ul, "REPO", tmp_path)
    row = {"rows_match": None, "schema_match": None, "hash_match": None,
           "spark_rows": 5, "oracle_rows": None, "err": "no_oracle"}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({"qs": row}))

    def fake_registry(_source):
        def qs():
            return None

        return {"qs": qs}, {}

    monkeypatch.setattr(ul, "_registry", fake_registry)
    ledger = ul.update(1, tmp_path)
    assert ledger["qs"]["oracle_md5"] is None


def test_no_oracle_sketches_do_not_hog_cap_slots():
    """The three rows-only sketches were driver-checked in round 3;
    they must sit in the verified block, not permanently first."""
    for name in ("approx_distinct_users", "approx_quantiles_price",
                 "hll_sketch_rollup_daily"):
        assert name in q._VERIFIED


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


def test_verified_recheck_oldest_green_first():
    """Within the verified block (after canaries), re-checks run in
    ascending last-green-round order so no family drifts stale."""
    verified_order = [n for n in q.QUERIES
                      if n in q._VERIFIED and n not in q._CANARIES]
    rounds = [q._VERIFIED[n] for n in verified_order]
    assert rounds == sorted(rounds)


def test_stale_lsh_family_inside_cap_window():
    """The round-3 stale/broken MinHash-LSH family must all sit inside
    the driver's 50-query per-round cap so round 4 re-verifies them."""
    order = list(q.QUERIES)
    for name in ("minhash_lsh_pairs", "ngram_jaccard_lsh", "dedup_clusters",
                 "dedup_keep_best", "triangle_count_near_dup_graph",
                 "pagerank_near_dup_graph"):
        assert order.index(name) < 50
