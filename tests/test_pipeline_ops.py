"""Observation-based pipeline metrics (zero-extra-pass accounting)."""

from conftest import SF_CORRECTNESS, SF_SMOKE


def test_observe_metrics_zero_extra_pass(spark):
    """Metrics arrive as a side effect of the one action; values match
    a direct aggregation."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.pipeline import (
        quality_gate_metrics,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    observed, obs = quality_gate_metrics(docs)
    n = observed.count()  # the single action
    got = obs.get
    assert got["rows"] == n
    direct = docs.agg(
        F.sum((F.col("text").isNull() | (F.length("text") == 0)).cast("long")),
        F.avg(F.length("text")),
    ).collect()[0]
    assert got["null_or_empty"] == (direct[0] or 0)
    assert abs(got["mean_chars"] - direct[1]) < 1e-9


def test_class_balanced_sample_oracle(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "class_balanced_sample")


def test_class_balanced_caps_every_class(spark):
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["class_balanced_sample"](spark, SF_CORRECTNESS).collect()
    from collections import Counter

    per = Counter(r.lang for r in rows)
    assert per and all(n <= 100 for n in per.values())


def test_decontamination_oracle(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "decontamination_overlap")


def test_decontamination_finds_planted_overlap(spark):
    """Near-dup planted copies spanning the eval/train id boundary
    must surface as 8-gram overlaps; and every reported pair must
    respect the id partition."""
    from map_reduce_library_spark.queries import QUERIES

    rows = QUERIES["decontamination_overlap"](spark, SF_CORRECTNESS).collect()
    for r in rows:
        assert r.train_doc_id >= 50 and r.eval_doc_id < 50 and r.n_shared >= 1


def test_document_chunking_oracle(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "document_chunking")


def test_document_chunking_covers_all_tokens(spark):
    """Every token index must fall inside >= 1 chunk; consecutive
    chunks overlap by size-stride; chunk_tokens never exceeds size."""
    from map_reduce_library_spark.queries import QUERIES
    from map_reduce_library_spark.tables import load_table
    from pyspark.sql import functions as F

    chunks = QUERIES["document_chunking"](spark, SF_CORRECTNESS).collect()
    n_toks = {
        r.doc_id: r.n
        for r in load_table(spark, SF_CORRECTNESS, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    per_doc = {}
    for r in chunks:
        assert 1 <= r.chunk_tokens <= 64
        per_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_tokens))
    for doc, cs in per_doc.items():
        cs.sort()
        # last chunk must reach the final token: start + len == n
        last_idx, last_n = cs[-1]
        assert last_idx * 48 + last_n == n_toks[doc]
        # chunk idxs are contiguous from 0
        assert [i for i, _ in cs] == list(range(len(cs)))


def test_weighted_sample_deterministic_and_weight_sensitive(spark):
    """A-ES sampling: stable under repartition; a row whose weight
    dwarfs the rest is effectively always picked (its jitter key is
    ~1000x smaller); appending rows never changes surviving keys."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.pipeline import (
        weighted_sample_topn,
    )

    rows = [(i, 10) for i in range(1, 200)] + [(500, 100000)]
    df = spark.createDataFrame(rows, "doc_id bigint, w bigint")
    got = weighted_sample_topn(df, F.col("w"), 5)
    picks = [r.doc_id for r in got.collect()]
    assert 500 in picks, "heavyweight row missed the sample"

    again = weighted_sample_topn(df.repartition(13), F.col("w"), 5)
    assert [r.doc_id for r in again.collect()] == picks

    # growth stability: adding rows can displace the cut but never
    # re-keys existing rows — any prior pick still present kept its key
    bigger = df.unionByName(
        spark.createDataFrame([(1000 + i, 10) for i in range(50)],
                              "doc_id bigint, w bigint")
    )
    keys1 = {r.doc_id: r.es_key for r in got.collect()}
    keys2 = {
        r.doc_id: r.es_key
        for r in weighted_sample_topn(bigger, F.col("w"), 5).collect()
    }
    for d in set(keys1) & set(keys2):
        assert keys1[d] == keys2[d]


def test_sample_then_split_selections_are_independent(spark):
    """Code-review r6: unsalted, every hash-derived selection used the
    same md5(doc_id), so a 10% stratified sample kept exactly buckets
    0-9 and a following 80/10/10 split put EVERY sampled row in
    'train' (buckets 0-9 < 80). With per-purpose salts the composed
    pipeline must produce all three splits in roughly the configured
    proportions."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.pipeline import (
        deterministic_split,
        stratified_sample,
    )

    docs = spark.range(5000).selectExpr("id AS doc_id", "'en' AS lang")
    sampled = stratified_sample(docs, {"en": 10}, "lang")
    n_sampled = sampled.count()
    assert 350 <= n_sampled <= 650  # ~10%
    counts = {
        r.split: r.n
        for r in deterministic_split(sampled)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "val", "test"}
    assert 0.04 <= counts["val"] / n_sampled <= 0.20
    assert 0.04 <= counts["test"] / n_sampled <= 0.20


def test_weighted_sample_keys_resolve_at_large_weights(spark):
    """Code-review r6: the raw A-ES key -ln(u)/w is <= ~41.6/w, so
    with ~1e9 weights absolute 9-dp rounding collapsed all keys onto
    a handful of grid values and the 'sample' degenerated to the id
    tiebreaker. The log-domain key must stay fully resolved."""
    from pyspark.sql import functions as F

    from map_reduce_library_spark.operators.pipeline import (
        weighted_sample_topn,
    )

    docs = spark.range(2000).selectExpr(
        "id AS doc_id", "CAST(1000000000 + id AS DOUBLE) AS w"
    )
    picked = weighted_sample_topn(docs, F.col("w"), 50).collect()
    keys = [r.es_key for r in picked]
    assert len(set(keys)) == len(keys), "key grid collapsed"
    # degenerate selection would be doc_ids 0..49; a resolved one is
    # spread across the id range
    ids = sorted(r.doc_id for r in picked)
    assert ids != list(range(50))
    assert max(ids) > 1000


def test_pack_sequences_ties_use_rows_frame(spark):
    """code-review r8 (verified): under the default RANGE frame, two
    docs tied on order_col each summed BOTH documents' tokens and
    landed together in an overfilled bin. With the ROWS frame one
    starts at offset 0 (bin 0) and the next at offset 10 (bin 2)."""
    from map_reduce_library_spark.operators.pipeline import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 10)],  # tied order key, 10 tokens each
        "doc_id bigint, ts bigint, n_tokens bigint",
    )
    bins = sorted(
        r.seq_bin
        for r in pack_sequences(
            df, "n_tokens", budget=5, order_col="ts"
        ).collect()
    )
    assert bins == [0, 2], bins


def test_decontamination_fuzzy_oracle(spark):
    from conftest import assert_oracle_match

    assert_oracle_match(spark, "decontamination_fuzzy")


def test_fuzzy_decon_catches_paraphrase_exact_misses(spark):
    """VERDICT r10 item 5's done-criterion: a PARAPHRASED eval doc in
    the train set — every 8th word swapped, so no 8 consecutive words
    survive verbatim — is invisible to exact 8-gram decontamination
    but shares most of its 3-gram shingles; the MinHash path must
    flag it. Also pins the estimator: the planted pair's est_jaccard
    must sit in a plausible band for the ~0.45 true Jaccard of the
    construction (component-matching is unbiased; at K=12 the
    estimate is coarse but must not be degenerate 0 or 1)."""
    from map_reduce_library_spark.operators.pipeline import (
        decontamination_overlap,
        fuzzy_decontamination,
    )

    words = [
        "alpha", "bridge", "candle", "dragon", "ember", "falcon",
        "garden", "harbor", "island", "jungle", "kettle", "lantern",
        "meadow", "needle", "orchid", "pebble", "quarry", "ribbon",
        "saddle", "timber", "urchin", "violet", "walnut", "xenon",
        "yonder", "zephyr", "anchor", "basket", "cobalt", "dewdrop",
        "easel", "fjord", "goblet", "hamlet", "ivory", "jigsaw",
        "kernel", "lagoon", "marble", "nimbus",
    ]
    eval_text = " ".join(words)
    train_words = list(words)
    for i in range(7, len(words), 8):  # positions 7,15,23,31,39
        train_words[i] = f"swapped{i}"
    train_text = " ".join(train_words)
    eval_df = spark.createDataFrame(
        [(1, eval_text)], "doc_id long, text string"
    )
    train_df = spark.createDataFrame(
        [(100, train_text)], "doc_id long, text string"
    )

    exact = decontamination_overlap(train_df, eval_df, n=8).collect()
    assert exact == [], "the paraphrase must defeat exact 8-gram decon"

    fuzzy = fuzzy_decontamination(train_df, eval_df).collect()
    assert len(fuzzy) == 1, "the MinHash path must flag the paraphrase"
    hit = fuzzy[0]
    assert hit.train_doc_id == 100 and hit.eval_doc_id == 1
    assert 0.0 < hit.est_jaccard < 1.0
