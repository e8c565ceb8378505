"""Empirical scaling curve for the checkpoint-shared dedup/CDC family
(VERDICT r6 item 4: prove the "per-query fixed overhead dominates at
sf0.1" claim instead of asserting it).

There is no sf1 testdata, so this builds DETERMINISTIC scale-ups of
sf0.1 under /tmp — measurement fixtures only, never correctness
inputs (correctness stays pinned to the driver's sf0.01 oracles):

  * documents ×F: replica i appends ``_r{i}`` to every token.
    A uniform token bijection preserves every intra-replica
    similarity relation EXACTLY (shingle sets map 1:1, so MinHash
    bands, CDC chunk structure, and duplicated spans are isomorphic
    per replica) while making cross-replica shingles fully disjoint
    — each replica behaves like fresh corpus, so near-dup density
    per row stays at the sf0.1 level instead of exploding
    quadratically the way naive text copies would.
  * embeddings ×F: replica i rotates the 64 dims by 13*i. A common
    coordinate permutation preserves intra-replica cosines exactly;
    across replicas vectors decorrelate, so the LSH band structure
    scales the way real corpus growth does.

Usage: python tools/scaling_probe.py [factors...] [--queries a,b,c]
(default factors 1 3 10; default queries the dedup/CDC family).
``--queries pagerank_near_dup_graph,dedup_clusters,triangle_count_near_dup_graph``
measures the iterative-graph family (VERDICT r7 item 4) on the same
fixtures — all three derive from the documents LSH candidate graph,
so the token-bijection replicas scale their edge sets the same way.
Prints one JSON line per (factor, query): pass1/pass2 wall seconds
and output rows. Paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
WORK = Path("/tmp/scaling_probe")
OFFSET = 10_000_000

QUERY_NAMES = ["minhash_lsh_pairs", "cdc_chunk_dedup", "emb_dedup_clusters"]


def _semdedup_scaled(factor: int):
    """SemDeDup with the paper's production knob applied: n_centroids
    grows with the corpus (K ∝ N keeps Σ|cluster|² linear — Abbas et
    al. run K≈100k at 5B docs). The fixed-K registry query measures
    the amortized query cost over the shared index; this variant
    measures the end-to-end build+dedup with the knob turned, i.e.
    the configuration a 10× corpus would actually run."""

    def run(spark, sf_dir):
        from map_reduce_library_spark.operators.similarity import (
            semdedup_removals,
        )
        from map_reduce_library_spark.querydefs.similarity import (
            SEMDEDUP_TAU,
        )
        from map_reduce_library_spark.tables import load_table

        return semdedup_removals(
            load_table(spark, sf_dir, "embeddings"),
            SEMDEDUP_TAU,
            n_centroids=16 * factor,
        )

    return run


def _zorder_scaled(factor: int):
    """Z-order clustered-rewrite cost at constant file size: the
    arranged DataFrame's materialization IS the work (bounds
    aggregate + one range exchange + in-partition sort); file count
    grows with the corpus (32 × factor) the way a fixed
    target_file_bytes would make it, so per-partition sort depth
    stays constant and the claim under test is linear total wall."""

    def run(spark, sf_dir):
        from map_reduce_library_spark.operators.layout import (
            zorder_arrange,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "n_chars", "lang"
        )
        return zorder_arrange(docs, ["doc_id", "n_chars"], 32 * factor)

    return run


_IVFPQ_PROBE_INDEX: dict = {}


def _ivfpq_serve_scaled(factor: int):
    """Persisted-index SERVE cost at scale: the index (centroids,
    codebooks, cells, codes) is built and written ONCE per factor —
    with the IVF production knob turned, n_centroids = 16·factor, so
    per-query candidate volume (corpus/cells × n_probe) stays
    constant — and the probed query is ivf_pq_search from the stored
    parquet relations. Pass 1 includes the build+write; pass 2 is the
    steady-state serve wall (the number BASELINE.md reports)."""

    def run(spark, sf_dir):
        from map_reduce_library_spark.operators.ann_index import (
            build_ivf_pq_index,
            ivf_pq_search,
            read_ivf_pq_index,
            write_ivf_pq_index,
        )

        path = _IVFPQ_PROBE_INDEX.get(sf_dir)
        if path is None:
            path = str(Path(sf_dir) / f"ivfpq_index_{factor}")
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            write_ivf_pq_index(
                build_ivf_pq_index(emb, 64, n_centroids=16 * factor),
                path,
            )
            _IVFPQ_PROBE_INDEX[sf_dir] = path
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        return ivf_pq_search(
            read_ivf_pq_index(spark, path),
            emb.where(F.col("vec_id") < 20),
            5,
            64,
            n_probe=2,
        )

    return run


# name -> factory(factor) -> (spark, sf_dir) -> DataFrame; probed
# INSTEAD of the registry entry of the same name when requested via
# --queries. Registry names stay untouched.
SCALED_VARIANTS = {
    "semdedup_scaled_centroids": _semdedup_scaled,
    "zorder_arrange_scaled": _zorder_scaled,
    "ivfpq_persisted_serve_scaled": _ivfpq_serve_scaled,
}


def build(spark, factor: int) -> str:
    out = WORK / f"f{factor}"
    # events.parquet joined the fixture in round 9 — a _DONE marker
    # from an older probe run lacks it, so rebuild in full then.
    if (out / "_DONE").exists() and (out / "events.parquet").exists():
        return str(out)
    shutil.rmtree(out, ignore_errors=True)
    out.mkdir(parents=True)

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = []
    for i in range(factor):
        salted = docs.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda t: F.concat(t, F.lit(f"_r{i}")),
                ),
                " ",
            ),
        ) if i else docs
        parts.append(
            salted.withColumn(
                "doc_id", F.col("doc_id") + F.lit(i * OFFSET)
            ).withColumn("n_chars", F.length("text"))
        )
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    acc.repartition(32).write.parquet(str(out / "documents.parquet"))

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    parts = []
    for i in range(factor):
        rot = (13 * i) % 64
        rotated = emb.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", rot + 1, 64 - rot),
                F.slice("embedding", 1, rot),
            ),
        ) if rot else emb
        parts.append(
            rotated.withColumn("vec_id", F.col("vec_id") + F.lit(i * OFFSET))
        )
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    acc.repartition(8).write.parquet(str(out / "embeddings.parquet"))

    # events ×F: replica i is a fresh user population (user_id offset
    # by the sf0.1 user count) generating traffic in the SAME time
    # window — the realistic growth shape for a (ts, user_id) layout
    # question: more rows per time slice, wider user domain.
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    parts = []
    for i in range(factor):
        parts.append(
            ev.withColumn("user_id", F.col("user_id") + F.lit(i * n_users))
            .withColumn("event_id", F.col("event_id") + F.lit(i * OFFSET))
        )
    acc = parts[0]
    for p in parts[1:]:
        acc = acc.unionByName(p)
    acc.repartition(32).write.parquet(str(out / "events.parquet"))
    (out / "_DONE").touch()
    return str(out)


def pruning_probe(spark, factors: list[int]) -> None:
    """Z-order end-to-end pruning at scale (VERDICT r8 item 6): write
    the scaled events table (a) range-sorted by ts alone and (b)
    z-ordered on (ts, user_id), 32·factor files each (constant file
    size as the corpus grows), then measure ACTUAL files a
    stats-pruning reader opens — real written footers via
    parquet_overlap_fraction — for the two canonical queries: a 10%
    time window (the single-key layout's home turf) and a one-user
    point lookup (its blind spot). The scaling claim under test: the
    z-order OVERLAP FRACTIONS hold flat at 10× — pruning is a
    property of the layout, not of the corpus size — while the
    ts-sorted layout's user query reads 100% of a 10×-larger table."""
    from map_reduce_library_spark.operators.layout import (
        parquet_overlap_fraction,
        write_zordered,
    )

    for factor in factors:
        sf_dir = build(spark, factor)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_files = 32 * factor
        ts_lo, ts_hi, uid_hi = ev.agg(
            F.min("ts"), F.max("ts"), F.max("user_id")
        ).collect()[0]
        base = Path(sf_dir)
        ts_dir = str(base / f"events_ts_sorted_{n_files}")
        z_dir = str(base / f"events_zordered_{n_files}")
        # _SUCCESS gates reuse: a bare existence check would measure a
        # crashed partial write forever (code-review r9 — the same
        # staleness guard build() has)
        if not (Path(ts_dir) / "_SUCCESS").exists():
            (
                ev.repartitionByRange(n_files, "ts")
                .sortWithinPartitions("ts")
                .write.mode("overwrite").parquet(ts_dir)
            )
        if not (Path(z_dir) / "_SUCCESS").exists():
            write_zordered(ev, z_dir, ["ts", "user_id"], n_files)
        # 10% time window in the middle of the month (ts arrives as a
        # datetime here — the rewritten fixture is TIMESTAMP(MICROS) —
        # and timedelta arithmetic keeps the window exact)
        span = ts_hi - ts_lo
        w_lo, w_hi = ts_lo + span * 0.45, ts_lo + span * 0.55
        # one user out of 1500·factor (point lookup on the 2nd dim)
        uid = uid_hi // 2
        rec = {"factor": factor, "n_files": n_files,
               "rows": ev.count()}
        for layout, path in (("ts_sorted", ts_dir), ("zorder", z_dir)):
            rec[f"{layout}_ts_window_frac"] = round(
                parquet_overlap_fraction(path, "ts", w_lo, w_hi), 3
            )
            rec[f"{layout}_user_point_frac"] = round(
                parquet_overlap_fraction(path, "user_id", uid, uid), 3
            )
        print(json.dumps(rec), flush=True)


from map_reduce_library_spark.diagnostics import (  # noqa: E402
    scan_file_counts as _serve_file_counts,
)


def eager_lazy_probe(spark, factors: list[int]) -> None:
    """VERDICT r11 item 5: quantify the documented eager-vs-lazy serve
    trade of ``ivf_pq_search`` (operators/ann_index.py) with numbers.
    Per factor: build+write the persisted index ONCE with the
    production K∝N knob (n_centroids = 16·factor — constant per-query
    candidate volume), then serve the same 20-query n_probe=2 batch
    both ways and report

      plan_sec   — time to CONSTRUCT the result DataFrame (eager runs
                   the two bounded up-front jobs: checkpoint the
                   query assignment + collect probed cells; lazy runs
                   ZERO jobs here)
      serve_sec  — min of 3 end-to-end executions of the built plan
      files      — numFiles across both row-table scans (eager pushes
                   cell IN (...) partition filters → min(q×probe,
                   cells); lazy cannot prune → every file of both
                   tables)

    The claim under test: lazy trades bytes-scanned for zero pinned
    blocks and zero latency-to-first-plan, and the gap GROWS with the
    corpus (pruned reads stay flat at the probe bound while full scans
    grow linearly) — so a serving loop should prefer eager unless
    plan-accumulation is the binding constraint."""
    from map_reduce_library_spark.operators.ann_index import (
        build_ivf_pq_index,
        ivf_pq_search,
        read_ivf_pq_index,
        write_ivf_pq_index,
    )

    for factor in factors:
        sf_dir = build(spark, factor)
        path = str(Path(sf_dir) / f"ivfpq_index_{factor}")
        if not (Path(path) / "centroids" / "_SUCCESS").exists():
            emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            write_ivf_pq_index(
                build_ivf_pq_index(emb, 64, n_centroids=16 * factor), path
            )
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 20)
        idx = read_ivf_pq_index(spark, path)
        rec = {"factor": factor, "n_cells": 16 * factor}
        for eager in (True, False):
            t0 = time.time()
            df = ivf_pq_search(idx, q, 5, 64, n_probe=2, eager=eager)
            plan_sec = round(time.time() - t0, 3)
            files = sum(_serve_file_counts(df, "ivfpq_index"))
            walls = []
            for _ in range(3):
                t0 = time.time()
                df = ivf_pq_search(idx, q, 5, 64, n_probe=2, eager=eager)
                df.write.format("noop").mode("overwrite").save()
                walls.append(time.time() - t0)
            tag = "eager" if eager else "lazy"
            rec[f"{tag}_plan_sec"] = plan_sec
            rec[f"{tag}_serve_sec"] = round(min(walls), 3)
            rec[f"{tag}_files"] = files
        print(json.dumps(rec), flush=True)


def rebalance_probe(spark, factor: int = 10) -> None:
    """VERDICT r10 item 1 done-criterion: after a ``factor``× append
    onto a frozen-centroid index, serve wall and files-read must come
    back FLAT once ``rebalance_ivf_pq_index`` + compaction run.

    Stages measured (same 20-query n_probe=2 serve each time, wall =
    min of 3 steady-state passes, files = numFiles of both row-table
    scans, plus the max rows a single probe can touch):

      1x        — fresh build on the sf0.1 embeddings, n_centroids=16
      appended  — the 9 rotated replicas appended (frozen centroids:
                  cells now hold ~10× the build-time rows; files-read
                  still tracks n_probe, but every probed file is 10×)
      rebalanced— rebalance(target = 1x rows/cell) + full compaction:
                  per-probe row volume restored, file count per probe
                  back to n_probe, serve wall back near the 1x line
    """
    import shutil as _sh

    from map_reduce_library_spark.operators.ann_index import (
        append_ivf_pq_index,
        build_ivf_pq_index,
        compact_ivf_pq_index,
        ivf_pq_search,
        read_ivf_pq_index,
        rebalance_ivf_pq_index,
        write_ivf_pq_index,
    )

    sf_dir = build(spark, factor)
    scaled = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = scaled.where(F.col("vec_id") < OFFSET)
    extra = scaled.where(F.col("vec_id") >= OFFSET)
    n_base = base.count()
    target = max(n_base // 16, 1)
    path = str(Path(sf_dir) / "ivfpq_rebalance_probe")
    _sh.rmtree(path, ignore_errors=True)
    write_ivf_pq_index(build_ivf_pq_index(base, 64, n_centroids=16), path)

    def measure(stage: str) -> None:
        from map_reduce_library_spark.operators.similarity import (
            ivf_assign_cells,
        )

        idx = read_ivf_pq_index(spark, path)
        q = base.where(F.col("vec_id") < 500)
        walls = []
        for _ in range(3):
            t0 = time.time()
            served = ivf_pq_search(idx, q, 5, 64, n_probe=2)
            n = served.count()
            walls.append(round(time.time() - t0, 2))
        served = ivf_pq_search(idx, q, 5, 64, n_probe=2)
        cells_files = _serve_file_counts(served, "/cells")
        served = ivf_pq_search(idx, q, 5, 64, n_probe=2)
        codes_files = _serve_file_counts(served, "/codes")
        sizes = idx.cells.groupBy("cell").count()
        max_cell = sizes.agg(F.max("count")).collect()[0][0]
        # ADC candidate volume: Σ over (query, probed cell) of cell
        # size — THE serve-cost number the rebalance exists to bound
        # (wall at this sf is job-launch dominated; candidate volume
        # is what scales with corpus growth)
        qa = ivf_assign_cells(q, 0, n_probe=2, centroids=idx.centroids)
        probed_rows = (
            qa.join(sizes, "cell").agg(F.sum("count")).collect()[0][0]
        )
        print(
            json.dumps(
                {
                    "stage": stage,
                    "rows": idx.cells.count(),
                    "n_centroids": idx.centroids.count(),
                    "max_cell_rows": max_cell,
                    "adc_candidate_rows": probed_rows,
                    "serve_wall_min3_s": min(walls),
                    "walls": walls,
                    "cells_files_read": max(cells_files or [0]),
                    "codes_files_read": max(codes_files or [0]),
                    "result_rows": n,
                }
            ),
            flush=True,
        )

    measure("1x")
    append_ivf_pq_index(spark, path, extra, 64)
    measure(f"{factor}x_appended")
    # the op's own cost: claimed O(hot-cell rows × dim) — the PQ
    # reconstruction + sub-centroid Lloyd over just the split set;
    # measured here so the bound is a number, not an assertion
    t0 = time.time()
    split = rebalance_ivf_pq_index(spark, path, target_rows_per_cell=target)
    rebal_wall = round(time.time() - t0, 2)
    t0 = time.time()
    compact_ivf_pq_index(spark, path, full=True)
    print(
        json.dumps(
            {
                "stage": "rebalance",
                "cells_split": split,
                "hot_rows": factor * n_base,  # uniform growth: all hot
                "rebalance_wall_s": rebal_wall,
                "compact_wall_s": round(time.time() - t0, 2),
            }
        ),
        flush=True,
    )
    measure(f"{factor}x_rebalanced")


def main() -> None:
    argv = sys.argv[1:]
    if "--rebalance" in argv:
        argv.remove("--rebalance")
        factor = int(argv[0]) if argv else 10
        from map_reduce_library_spark.session import get_session

        spark = get_session(app_name="scaling-probe")
        spark.sparkContext.setLogLevel("ERROR")
        rebalance_probe(spark, factor)
        return
    if "--pruning" in argv:
        argv.remove("--pruning")
        factors = [int(a) for a in argv] or [1, 10]
        from map_reduce_library_spark.session import get_session

        spark = get_session(app_name="scaling-probe")
        spark.sparkContext.setLogLevel("ERROR")
        pruning_probe(spark, factors)
        return
    if "--eager-lazy" in argv:
        argv.remove("--eager-lazy")
        factors = [int(a) for a in argv] or [1, 10]
        from map_reduce_library_spark.session import get_session

        spark = get_session(app_name="scaling-probe")
        spark.sparkContext.setLogLevel("ERROR")
        eager_lazy_probe(spark, factors)
        return
    query_names = list(QUERY_NAMES)
    if "--queries" in argv:
        i = argv.index("--queries")
        if i + 1 >= len(argv):
            sys.exit("--queries requires a comma-separated value")
        query_names = argv[i + 1].split(",")
        argv = argv[:i] + argv[i + 2 :]
    factors = [int(a) for a in argv] or [1, 3, 10]
    from map_reduce_library_spark.queries import QUERIES
    from map_reduce_library_spark.session import get_session

    # Validate BEFORE the expensive fixture builds — a typo'd name
    # must not surface as a KeyError after minutes of scale-up I/O.
    unknown = [
        q for q in query_names
        if q not in QUERIES and q not in SCALED_VARIANTS
    ]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    spark = get_session(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # codegen/Python-worker warmup, mirroring bench.py
    spark.range(100).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    results = []
    for factor in factors:
        sf_dir = build(spark, factor)
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        for name in query_names:
            fn = (
                SCALED_VARIANTS[name](factor)
                if name in SCALED_VARIANTS
                else QUERIES[name]
            )
            times = []
            rows = None
            for _ in range(2):
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 2))
            rows = fn(spark, sf_dir).count()
            rec = {
                "factor": factor,
                "rows_in": n_docs,
                "query": name,
                "pass1_sec": times[0],
                "pass2_sec": times[1],
                "rows_out": rows,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    print(json.dumps({"all": results}))


if __name__ == "__main__":
    main()
