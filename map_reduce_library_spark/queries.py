"""Query registry: the driver-checked corpus.

Every implemented operator from SURVEY.md §2 registers here as a
``(name, spark_callable, oracle_sql)`` triple. The spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle is ANSI SQL
DuckDB runs on the same parquet (omitted only for genuinely
non-SQL-expressible operators — the driver then records a weaker
rows-only check).

Column-name discipline: every computed column is aliased identically in
the Spark plan and the SQL so the driver's sorted-by-name value hash
compares apples to apples.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and its DuckDB oracle) to the corpus."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


# Registration modules (import side-effects populate the registry).
# Import order is NOT the driver check order — the sorted() rebuild at
# the bottom of this file fully determines it (staleness tiers, then
# name), so new querydef modules can be appended anywhere here
# (code-review r8: an older comment claimed position mattered).
# Cross-module ORACLE references do constrain a few imports: dedup
# composes text's oracle SQL, so text must import first.
from map_reduce_library_spark.querydefs import mapreduce_parity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import text  # noqa: E402,F401
from map_reduce_library_spark.querydefs import dedup  # noqa: E402,F401  (needs text's oracle)
from map_reduce_library_spark.querydefs import similarity  # noqa: E402,F401
from map_reduce_library_spark.querydefs import streaming  # noqa: E402,F401
from map_reduce_library_spark.querydefs import temporal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import eventsql  # noqa: E402,F401
from map_reduce_library_spark.querydefs import pipeline  # noqa: E402,F401
from map_reduce_library_spark.querydefs import multimodal  # noqa: E402,F401
from map_reduce_library_spark.querydefs import extensibility  # noqa: E402,F401
from map_reduce_library_spark.querydefs import cogroup  # noqa: E402,F401
from map_reduce_library_spark.querydefs import skewq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational10  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational9  # noqa: E402,F401
from map_reduce_library_spark.querydefs import approx  # noqa: E402,F401
from map_reduce_library_spark.querydefs import wordcount  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational2  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational3  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational4  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational5  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational6  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational7  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational8  # noqa: E402,F401
from map_reduce_library_spark.querydefs import relational11  # noqa: E402,F401
from map_reduce_library_spark.querydefs import bloomq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import variantq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import lm  # noqa: E402,F401
from map_reduce_library_spark.querydefs import cmsq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import bpe  # noqa: E402,F401
from map_reduce_library_spark.querydefs import retrieval  # noqa: E402,F401
from map_reduce_library_spark.querydefs import expectations  # noqa: E402,F401
from map_reduce_library_spark.querydefs import spans  # noqa: E402,F401
from map_reduce_library_spark.querydefs import manifests  # noqa: E402,F401
from map_reduce_library_spark.querydefs import maintenanceq  # noqa: E402,F401
from map_reduce_library_spark.querydefs import embingest  # noqa: E402,F401

# Registry order = driver check order.  Rebuild the dicts so queries
# with no trustworthy green come first (hash-oracled before rows-only),
# and already-verified ones re-check last, oldest green first.
#
# _VERIFIED is DERIVED from VERIFIED_LEDGER.json (built by
# tools/update_ledger.py from the committed CORRECTNESS_r*.json
# artifacts), and it is STALENESS-AWARE: each ledger entry carries md5
# hashes of the oracle SQL and the querydef source as they were when
# the driver verified them, so editing either demotes the query back to
# unverified-first (VERDICT.md round 3, "What's wrong" §3 — five r1/r2
# greens survived an oracle+implementation rewrite undetected).
# Rows-only sketches (no registered oracle, driver records rows only)
# count verified once a rows row exists — they can never go hash-green
# and must not permanently occupy cap slots (ADVICE round 3).


_DEPS_MD5_CACHE: dict[str, str | None] = {}


def deps_md5(fn) -> str | None:
    """md5 over the BEHAVIOR modules (operators/streaming/core/sources
    files, transitive closure by source scan) that ``fn``'s defining
    querydef module references. Closes the staleness-ledger gap ADVICE
    r4 flagged: ``fn_md5`` covers only the registered function's own
    source, so rewriting an operator the querydef calls used to keep
    stale greens silently (ivf_assign_cells was rewritten in r4 yet
    ivf_ann_topk kept its r2 green) — folding the operator-module
    content into the ledger hash auto-demotes dependents the same way
    oracle/querydef edits already do."""
    import hashlib
    import re
    import sys
    from pathlib import Path

    mod_name = getattr(fn, "__module__", None)
    if mod_name in _DEPS_MD5_CACHE:
        return _DEPS_MD5_CACHE[mod_name]
    mod = sys.modules.get(mod_name)
    src = getattr(mod, "__file__", None)
    if src is None:
        _DEPS_MD5_CACHE[mod_name] = None
        return None
    pkg_root = Path(__file__).resolve().parent
    dep_re = re.compile(
        r"map_reduce_library_spark\.(operators|streaming|core|sources"
        r"|querydefs)\.(\w+)"
    )
    # Top-level package modules querydefs import directly (code-review
    # r8: `from map_reduce_library_spark.tables import load_table` and
    # friends were outside the regex closure, so a behavior edit to
    # tables.normalize_event_ts kept every event query's stale green).
    top_re = re.compile(r"map_reduce_library_spark\.(tables|session)\b")
    visited: set[Path] = set()
    dep_files: set[Path] = set()
    stack = [Path(src)]
    while stack:
        p = stack.pop()
        if p in visited:
            continue
        visited.add(p)
        try:
            text = p.read_text()
        except OSError:
            continue
        for m in dep_re.finditer(text):
            dp = pkg_root / m.group(1) / (m.group(2) + ".py")
            if dp.exists() and dp not in visited:
                dep_files.add(dp)
                stack.append(dp)
        for m in top_re.finditer(text):
            dp = pkg_root / (m.group(1) + ".py")
            if dp.exists() and dp not in visited:
                dep_files.add(dp)
                stack.append(dp)
    h = hashlib.md5()
    for dp in sorted(dep_files):
        h.update(dp.name.encode())
        try:
            h.update(dp.read_bytes())
        except OSError:
            pass
    digest = h.hexdigest()
    _DEPS_MD5_CACHE[mod_name] = digest
    return digest


def _load_verified() -> dict[str, int]:
    """name -> round of last trustworthy green (hash-validated)."""
    import hashlib
    import inspect
    import json
    from pathlib import Path

    path = Path(__file__).resolve().parents[1] / "VERIFIED_LEDGER.json"
    try:
        ledger = json.loads(path.read_text())
    except (OSError, ValueError):
        return {}

    def md5(text: str | None) -> str | None:
        return None if text is None else hashlib.md5(text.encode()).hexdigest()

    out: dict[str, int] = {}
    for name, entry in ledger.items():
        if name not in QUERIES or not isinstance(entry, dict):
            continue
        _IN_LEDGER.add(name)
        if entry.get("oracle_md5") != md5(ORACLES.get(name)):
            _STALE_SELF.add(name)
            continue  # oracle changed since green -> stale
        try:
            fn_md5 = md5(inspect.getsource(QUERIES[name]))
        except (OSError, TypeError):
            fn_md5 = None
        if entry.get("fn_md5") != fn_md5:
            _STALE_SELF.add(name)
            continue  # querydef changed since green -> stale
        # Legacy entries lack deps_md5; only entries that recorded one
        # are held to it (update_ledger stamps it from this function).
        if "deps_md5" in entry and entry["deps_md5"] != deps_md5(
            QUERIES[name]
        ):
            continue  # an operator the querydef calls changed -> stale
        out[name] = int(entry.get("round", 0))
        _LEDGER_SOURCE[name] = entry.get("source", "driver")
    return out


# Stale entries whose OWN oracle or querydef source changed (vs
# deps-only demotions, where an operator module the querydef merely
# references was edited). When demotions outnumber the driver's
# 50-slot cap, the self-changed ones carry the most re-verification
# risk and must be sampled first.
_STALE_SELF: set[str] = set()
# Every query with ANY ledger entry (fresh or stale). An ever-green
# query ABSENT here was red-regressed (update_ledger deletes reds) —
# after a fix it must re-check in the highest-risk tier, not compete
# alphabetically at the bottom of the deps-only pool (code-review r8).
_IN_LEDGER: set[str] = set()
# name -> "driver" | "local": where the last trustworthy green came
# from. "local" means tools/update_ledger.py --local folded a local
# drive_entry.py differential (same hash procedure, this machine);
# the driver itself has not re-hashed that exact source yet.
_LEDGER_SOURCE: dict[str, str] = {}
_VERIFIED = _load_verified()


def _load_ever_green() -> set[str]:
    """Names with at least one GREEN row in any committed
    CORRECTNESS_r*.json (hash-green, or rows-only green for the
    oracle-less sketches — the same criteria tools/update_ledger.py
    uses). Unverified queries WITHOUT any green ever — brand-new ones
    the driver has never sampled AND ones whose every sampled row was
    an err/mismatch — rank ahead of staleness-demoted re-checks:
    round 5 ended with 7 finished-but-never-sampled queries because
    the 50-slot sample was consumed alphabetically (VERDICT r5 item
    6), and the red `source_lang_mix` kept losing its slot the same
    way. A first-ever correctness signal must never be crowded out by
    a repeat one."""
    import json
    from pathlib import Path

    green: set[str] = set()
    for p in Path(__file__).resolve().parents[1].glob(
        "CORRECTNESS_r*.json"
    ):
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            hash_green = (
                row.get("err") is None
                and bool(row.get("rows_match"))
                and bool(row.get("schema_match"))
                and row.get("hash_match") is not False
            )
            rows_only_green = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if hash_green or rows_only_green:
                green.add(name)
    return green


_EVER_GREEN = _load_ever_green()

# Regression canaries: re-check the reference-parity flagship (C3-C6
# wordcount) and the first relational queries ahead of other verified
# re-checks whenever cap slots remain.
_CANARIES = ("wordcount", "filter_project", "pricing_summary")

# Hand-curated driver-provenance refresh list (VERDICT r10 items 1-2):
# names here sort immediately after the never-green tier, ahead of
# every other re-check, so the next driver 50-sample re-hashes them
# with driver provenance even when a local fold has already restored
# their ledger validity. Round 12: CORRECTNESS_r11 drained all eight
# round-11 entries driver-green, so the list re-curates to this
# round's risk set — the five persisted-index serve queries (the
# lease/healing rework re-touched their whole dep closure: O_EXCL
# claims, heal-under-lease, lost-flag aborts, shared base build) and
# the generic-MR parity family (PairCounters instrumented the
# map/reduce wrappers in core/mapreduce.py). The new jpeg queries
# need no slot: never-green sorts ahead of everything automatically.
# Curated per round — remove entries once CORRECTNESS_r{N} records
# their driver green.
_PRIORITY_REFRESH = (
    "ivf_pq_persisted_topk",
    "ivf_pq_filtered_topk",
    "ivf_pq_deleted_topk",
    "ivf_pq_incremental_topk",
    "ivf_pq_rebalanced_topk",
    "mr_holistic_median",
    "mr_sortmode_wordcount",
    "mr_combiner_wordcount",
)


def _order_key(name: str) -> tuple:
    verified = name in _VERIFIED
    # never-green first (tier 0 below), then the curated refresh list,
    # then everything else in the existing tiered order
    front = 0 if name not in _EVER_GREEN else (
        1 if name in _PRIORITY_REFRESH else 2
    )
    canary = _CANARIES.index(name) if name in _CANARIES else len(_CANARIES)
    # Verified queries re-check oldest-green-first so no family's last
    # green ever drifts more than a couple of rounds stale.
    age = _VERIFIED.get(name, 0)
    # Among unverified: never-green first (no trustworthy correctness
    # signal EVER — never sampled, or every sampled row was red), then
    # re-checks whose OWN querydef/oracle changed (semantic edits —
    # highest re-verification risk), then deps-only demotions (an
    # operator module the querydef references was edited).
    if name not in _EVER_GREEN:
        tier = 0
    elif name in _STALE_SELF or name not in _IN_LEDGER:
        tier = 1  # own-source change, or a red-evicted green (cr r8)
    else:
        tier = 2
    # Among verified: canaries first, then queries the DRIVER has
    # never hash-greened (a local differential is the only evidence —
    # a first-ever driver signal beats any repeat), then entries whose
    # last trustworthy green is a local fold (driver hasn't re-hashed
    # that source; round 6 proved local-only freshness reads as debt),
    # then driver-fresh entries oldest-green-first.
    if name not in _EVER_GREEN:
        vtier = 0
    elif _LEDGER_SOURCE.get(name) == "local":
        vtier = 1
    else:
        vtier = 2
    return (
        front,
        verified,
        name not in ORACLES,
        canary if verified else tier,
        vtier if verified else 0,
        age,
        name,
    )


_order = sorted(QUERIES, key=_order_key)
QUERIES = {n: QUERIES[n] for n in _order}
ORACLES = {n: ORACLES[n] for n in _order if n in ORACLES}
