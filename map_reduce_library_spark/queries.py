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


_DEPS_MAP_MODULE_CACHE: dict[str, tuple] = {}
_DEPS_MAP_CACHE: dict[tuple[str, str], dict | None] = {}
# process-lifetime caches: file content digests and per-file package
# reference sets, shared across the 200+ per-query map computations
_FILE_MD5_CACHE: dict = {}
_FILE_REFS_CACHE: dict = {}


def _module_slices(mod_name: str):
    """Parse a querydef module once into (top_defs, header_stmts):
    ``top_defs`` maps each top-level function/class name to its source
    segment; ``header_stmts`` is a list of (bound_names, segment) for
    top-level imports and assignments. Cached per module."""
    import ast
    import sys

    if mod_name in _DEPS_MAP_MODULE_CACHE:
        return _DEPS_MAP_MODULE_CACHE[mod_name]
    mod = sys.modules.get(mod_name)
    src_path = getattr(mod, "__file__", None)
    if src_path is None:
        _DEPS_MAP_MODULE_CACHE[mod_name] = (None, None, None)
        return _DEPS_MAP_MODULE_CACHE[mod_name]
    try:
        text = open(src_path).read()
        tree = ast.parse(text)
    except (OSError, SyntaxError):
        _DEPS_MAP_MODULE_CACHE[mod_name] = (None, None, None)
        return _DEPS_MAP_MODULE_CACHE[mod_name]
    import re

    words = re.compile(r"\w+")
    lines = text.splitlines(keepends=True)

    def segment(node) -> str:
        # line-sliced (column-inclusive head/tail) — same result as
        # ast.get_source_segment for top-level statements without its
        # per-call O(file) text scan
        try:
            s, e = node.lineno - 1, node.end_lineno
        except AttributeError:
            return ""
        col = node.col_offset
        decorators = getattr(node, "decorator_list", None)
        if decorators:
            # node.lineno for a decorated def/class is the def line —
            # decorators live ABOVE it. Excluding them would let a
            # behavior-bearing decorator on a helper change without
            # perturbing the <local> digest, surviving a stale green
            # (ADVICE r13). Start at the first decorator's line, col 0
            # (the '@' sits one column left of d.col_offset).
            s = min(d.lineno for d in decorators) - 1
            col = 0
        seg_lines = list(lines[s:e])
        if not seg_lines:
            return ""
        seg_lines[-1] = seg_lines[-1][: node.end_col_offset]
        seg_lines[0] = seg_lines[0][col:]
        return "".join(seg_lines)

    # each entry: (trigger_names, segment, segment_word_set) — word
    # sets make the reachability fixpoint linear instead of rescanning
    # a growing text blob with per-name regexes
    top_defs: dict[str, tuple[str, frozenset]] = {}
    header_stmts: list[tuple[frozenset, str, frozenset]] = []
    for node in tree.body:
        seg = segment(node)
        seg_words = frozenset(words.findall(seg))
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            top_defs[node.name] = (seg, seg_words)
        elif isinstance(node, ast.Import):
            names = frozenset(
                (a.asname or a.name.split(".")[0]) for a in node.names
            )
            header_stmts.append((names, seg, seg_words))
        elif isinstance(node, ast.ImportFrom):
            names = frozenset((a.asname or a.name) for a in node.names)
            header_stmts.append((names, seg, seg_words))
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [
                node.target
            ]
            bound: set[str] = set()
            for t in targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        bound.add(n.id)
            header_stmts.append((frozenset(bound), seg, seg_words))
        elif not (
            isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
        ):
            # any OTHER top-level statement (a try/if-guarded import,
            # a loop building a registry, a side-effecting call) has
            # no bound-name gate to reason about — mark it
            # ALWAYS-INCLUDED (names=None) in every query's slice
            # rather than let a conditional import escape the
            # staleness hash. None exist in the corpus today; this is
            # the forward guard. Docstrings/bare constants (Expr of
            # Constant) stay excluded.
            header_stmts.append((None, seg, seg_words))
    _DEPS_MAP_MODULE_CACHE[mod_name] = (src_path, top_defs, header_stmts)
    return _DEPS_MAP_MODULE_CACHE[mod_name]


def deps_md5_map(fn) -> dict[str, str] | None:
    """Per-QUERY dependency digests: {relpath: md5} over exactly the
    package files ``fn``'s own slice of its querydef module reaches,
    plus a ``"<local>"`` digest of the same-module helpers it uses.

    Replaces the per-MODULE ``deps_md5`` granularity for staleness
    checks (VERDICT r12 item 1: a function-local
    ``from querydefs.similarity import ...`` inside ONE dedup query
    pulled operators/ann_index.py into the shared module closure, so
    any ann_index edit demoted all 26 dedup queries — 160 ledger
    demotions from one end-of-round commit). The slice is: the
    registered function's source, plus (fixpoint) any top-level
    same-module helper/class whose name it references, plus any
    top-level import/assignment whose bound name it references. The
    package files referenced from that slice expand transitively by
    whole-file scan (operator-module internals stay coarse on
    purpose: an operator edit must demote the queries that genuinely
    call it). Falls back to None (callers then use ``deps_md5``) when
    the function's source is unavailable."""
    import hashlib
    import inspect
    import re
    from pathlib import Path

    mod_name = getattr(fn, "__module__", None)
    qualname = getattr(fn, "__qualname__", repr(fn))
    key = (mod_name or "", qualname)
    if key in _DEPS_MAP_CACHE:
        return _DEPS_MAP_CACHE[key]
    src_path, top_defs, header_stmts = _module_slices(mod_name)
    try:
        fn_src = inspect.getsource(fn)
    except (OSError, TypeError):
        fn_src = None
    if src_path is None or fn_src is None:
        _DEPS_MAP_CACHE[key] = None
        return None

    # Fixpoint: pull in same-module helpers and header statements the
    # accumulated slice references by name. Word-set membership over
    # source text over-includes (a name inside an oracle SQL string
    # still counts) — the safe direction for a staleness hash.
    # CONSTRAINT (ADVICE r13): the name match is literal, so a helper
    # reached only through a dynamically constructed name
    # (globals()[f"impl_{mode}"], getattr with a computed string)
    # would be under-included and its edits would not demote the
    # query. Querydef modules must not use such references —
    # enforced by tests/test_registry_order.py::
    # test_querydefs_have_no_dynamic_same_module_references.
    seen_words: set[str] = set(re.findall(r"\w+", fn_src))
    included_defs: dict[str, str] = {}
    included_headers: list[str] = []
    header_used = [False] * len(header_stmts)
    parts = [fn_src]
    changed = True
    while changed:
        changed = False
        for dname, (dseg, dwords) in top_defs.items():
            if dname in included_defs or dname == getattr(
                fn, "__name__", None
            ):
                continue
            if dname in seen_words:
                included_defs[dname] = dseg
                parts.append(dseg)
                seen_words |= dwords
                changed = True
        for i, (names, seg, seg_words) in enumerate(header_stmts):
            if header_used[i]:
                continue
            if names is None or not names.isdisjoint(seen_words):
                header_used[i] = True
                included_headers.append(seg)
                parts.append(seg)
                seen_words |= seg_words
                changed = True

    pkg_root = Path(__file__).resolve().parent
    dep_re = re.compile(
        r"map_reduce_library_spark\.(operators|streaming|core|sources"
        r"|querydefs)\.(\w+)"
    )
    top_re = re.compile(r"map_reduce_library_spark\.(tables|session)\b")
    own = Path(src_path).resolve()

    def refs_of(text: str) -> set[Path]:
        found: set[Path] = set()
        for m in dep_re.finditer(text):
            dp = (pkg_root / m.group(1) / (m.group(2) + ".py")).resolve()
            if dp.exists():
                found.add(dp)
        for m in top_re.finditer(text):
            dp = (pkg_root / (m.group(1) + ".py")).resolve()
            if dp.exists():
                found.add(dp)
        return found

    # Seed scan over the query's slice only; transitive expansion over
    # whole files (same walk deps_md5 uses), with per-file ref sets
    # cached across the 200+ queries sharing operator hubs.
    visited: set[Path] = {own}
    dep_files: set[Path] = set()
    stack: list[Path] = [p for p in refs_of("\n".join(parts)) if p != own]
    dep_files.update(stack)
    while stack:
        p = stack.pop()
        if p not in _FILE_REFS_CACHE:
            try:
                _FILE_REFS_CACHE[p] = refs_of(p.read_text())
            except OSError:
                _FILE_REFS_CACHE[p] = set()
        visited.add(p)
        for dp in _FILE_REFS_CACHE[p]:
            if dp != own and dp not in visited and dp not in dep_files:
                dep_files.add(dp)
                stack.append(dp)

    out: dict[str, str] = {}
    repo_pkg = pkg_root.resolve()
    for dp in sorted(dep_files):
        if dp not in _FILE_MD5_CACHE:
            try:
                _FILE_MD5_CACHE[dp] = hashlib.md5(
                    dp.read_bytes()
                ).hexdigest()
            except OSError:
                _FILE_MD5_CACHE[dp] = None
        digest = _FILE_MD5_CACHE[dp]
        if digest is None:
            continue
        out[str(dp.relative_to(repo_pkg))] = digest
    lh = hashlib.md5()
    for dname in sorted(included_defs):
        lh.update(dname.encode())
        lh.update(included_defs[dname].encode())
    for seg in sorted(included_headers):
        lh.update(seg.encode())
    out["<local>"] = lh.hexdigest()
    _DEPS_MAP_CACHE[key] = out
    return out


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
        # Dep staleness, finest evidence wins: entries stamped with the
        # per-QUERY deps_md5_map are held to it (and only it — the
        # coarse per-module deps_md5 would re-demote them on sibling
        # edits, defeating VERDICT r12 item 1); entries with only the
        # legacy per-module digest keep the old check; entries with
        # neither (pre-r4) are held to oracle/fn hashes alone.
        if isinstance(entry.get("deps_md5_map"), dict):
            if entry["deps_md5_map"] != deps_md5_map(QUERIES[name]):
                continue  # a file this query actually reaches changed
        elif "deps_md5" in entry and entry["deps_md5"] != deps_md5(
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
# their ledger validity. Round 13: CORRECTNESS_r12 drained all eight
# round-12 entries driver-green; the list re-curates to this round's
# risk set — exactly the 12 queries the round-13 edits demoted (the
# per-query deps_md5_map kept the blast radius to genuine
# dependents): the jpeg family (three decoder edge-case fixes: fill
# bytes, ZRL bounds, per-restart-segment garbage), the generic-MR
# parity family (PairCounters docstring + the sink= write variant in
# the same dep closure), and the multimodal family (shares
# operators/jpeg.py). All 12 re-differentialed local-green the same
# day (r13_local1 fold). Curated per round — remove entries once
# CORRECTNESS_r{N} records their driver green.
_PRIORITY_REFRESH = (
    "jpeg_image_stats",
    "jpeg_thumbnail_stats",
    "mr_combiner_wordcount",
    "mr_generic_wordcount",
    "mr_holistic_median",
    "mr_multi_emit_extremes",
    "mr_sortmode_wordcount",
    "mr_zero_emit_filter",
    "multimodal_features",
    "multimodal_frames",
    "multimodal_meta",
    "multimodal_resize",
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
