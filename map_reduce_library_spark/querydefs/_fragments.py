"""Shared oracle SQL fragments — a LEAF module (imports only from
``operators.*`` leaf modules — text and similarity — never from
``queries`` or sibling querydefs).

Why this exists (VERDICT r4, "What's wrong" §2): ``querydefs/dedup.py``
used to read ``ORACLES["text_stats"]`` at import time to compose the
``dedup_keep_best`` oracle. That works when ``queries.py`` drives the
imports (text registers before dedup), but a user importing
``querydefs.text`` directly starts text.py, which imports ``queries``,
which re-enters the partially-initialized ``text`` module and then
imports ``dedup`` — whose ``ORACLES["text_stats"]`` lookup crashes with
a ``KeyError`` from an unrelated module. Composing from this leaf
module instead makes every querydef module independently importable.

The fragment text is byte-identical (after the registry's whitespace
normalization) to what ``text.py`` registers, so composed oracles and
the staleness ledger hashes are unchanged.
"""

from __future__ import annotations

from map_reduce_library_spark.operators.similarity import (
    ANN_BAND_PLANES,
    ANN_TABLES,
    hyperplane_weights,
)
from map_reduce_library_spark.operators.dedup import (
    MINHASH_P,
    SHINGLE_N,
    minhash_coeffs,
)
from map_reduce_library_spark.operators.text import STOPWORDS

EMB_DIM = 64  # embeddings.embedding length (TESTDATA.md)


def sql_hit_ratio(words: tuple[str, ...]) -> str:
    """DuckDB expression: fraction of ``toks`` that are in ``words``."""
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        f"len(list_filter(toks, t -> t IN ({lst}))) / "
        f"CAST(greatest(len(toks), 1) AS DOUBLE)"
    )


def _norm(sql: str) -> str:
    """Whitespace-normalize exactly like the registry does, so a
    fragment embedded into a composed oracle produces byte-identical
    registered SQL to the pre-refactor ORACLES[...] composition (the
    staleness ledger hashes the normalized text)."""
    return " ".join(sql.split())


TEXT_STATS_SQL = _norm(f"""
    WITH t AS (SELECT doc_id, text AS t, string_split(text, ' ') AS toks
               FROM documents),
    m AS (
      SELECT doc_id,
             CAST(length(t) AS BIGINT) AS n_chars_calc,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
             {sql_hit_ratio(STOPWORDS['en'])} AS stop_ratio
      FROM t
    )
    SELECT doc_id, n_tokens, n_distinct,
           (n_chars_calc - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE) AS mean_tok_len,
           n_distinct / CAST(n_tokens AS DOUBLE) AS ttr,
           stop_ratio,
           CASE WHEN n_tokens IS NULL THEN NULL
                ELSE round(least(n_tokens / 50.0, 1.0) * 0.4
                     + least((n_distinct / CAST(n_tokens AS DOUBLE)) * 2, 1.0) * 0.4
                     + least(stop_ratio * 5, 1.0) * 0.2, 6) END AS quality_score
    FROM m
    """)

_LANG_SCORES_SQL = ",\n             ".join(
    f"{sql_hit_ratio(ws)} AS score_{lang}" for lang, ws in STOPWORDS.items()
)
_LANG_STRUCTS = ", ".join(
    f"{{'s': score_{lang}, 'l': '{lang}'}}" for lang in STOPWORDS
)
_LANG_GREATEST = ", ".join(f"score_{lang}" for lang in STOPWORDS)

LANG_ID_SQL = _norm(f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    s AS (
      SELECT doc_id,
             {_LANG_SCORES_SQL}
      FROM t
    )
    SELECT doc_id, {_LANG_GREATEST},
           CASE WHEN greatest({_LANG_GREATEST}) IS NULL
                  OR greatest({_LANG_GREATEST}) < 0.02 THEN 'und'
                ELSE list_max([{_LANG_STRUCTS}]).l END AS pred_lang
    FROM s
    """)


def oracle_sig_sql(vec: str, table: int = 0) -> str:
    """DuckDB expression for one table's hyperplane-LSH signature —
    identical hyperplanes to operators.similarity (same seed stream)."""
    ws = hyperplane_weights(ANN_BAND_PLANES, EMB_DIM, table)
    bits = []
    for p in range(ANN_BAND_PLANES):
        lit = "[" + ", ".join(str(w) for w in ws[p]) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_dot_product({vec}, {lit}) > 0 "
            f"THEN '1' ELSE '0' END)"
        )
    return " || ".join(bits)


def oracle_banded_sigs_cte(src: str = "e") -> str:
    """UNION ALL of one per-table signature projection — the DuckDB
    twin of operators.similarity._banded_sigs."""
    return " UNION ALL ".join(
        f"SELECT vec_id, v, nrm, {t} AS tbl, {oracle_sig_sql('v', t)} AS sig "
        f"FROM {src}"
        for t in range(ANN_TABLES)
    )


def bm25_scores_ctes(terms: tuple[str, ...]) -> str:
    """CTE chain ending in ``w`` = per-(doc, term) BM25 weights for a
    fixed bag-of-terms query — shared by the ``bm25_topk_docs`` oracle
    and the hybrid-RRF oracle so the scoring pipeline exists exactly
    once (a formula change diverging the two copies would not be
    caught by the differential, since the Spark side feeds both)."""
    from map_reduce_library_spark.operators.text import BM25_B, BM25_K1

    terms_sql = ", ".join(f"'{t}'" for t in terms)
    return f"""tokc AS (
      SELECT doc_id, tok, count(*) AS cnt FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
      ) GROUP BY 1, 2
    ),
    dl AS (SELECT doc_id, sum(cnt) AS dl FROM tokc GROUP BY 1),
    stats AS (SELECT avg(dl) AS avgdl FROM dl),
    n AS (SELECT count(*) AS n_docs FROM documents),
    qt AS (SELECT * FROM tokc WHERE tok IN ({terms_sql})),
    dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM qt GROUP BY 1),
    w AS (
      SELECT qt.doc_id,
             ln(1 + (n.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (qt.cnt * ({BM25_K1} + 1.0))
               / (qt.cnt + {BM25_K1}
                  * (1.0 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)) AS w
      FROM qt
        JOIN dfreq USING (tok)
        JOIN dl USING (doc_id)
        CROSS JOIN stats CROSS JOIN n
    )"""


# ---- MinHash/LSH oracle fragments (DuckDB dialect) -------------------------
# Moved here from querydefs/dedup.py in round 11: querydefs/pipeline.py
# (decontamination_fuzzy) needs the same generators, and importing a
# SIBLING querydef for them recreates exactly the circular-import crash
# this module exists to prevent (a direct `import querydefs.dedup`
# re-enters dedup through queries→pipeline before the fragment names
# exist — caught by tests/test_direct_imports.py). Text is byte-
# identical to the pre-move fragments.

MINHASH_SHINGLE_CTE = f"""
tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         unnest([{'||'.join(f"toks[i+{j}]" + ("||' '" if j < SHINGLE_N - 1 else "") for j in range(SHINGLE_N))}
                 FOR i IN generate_series(1, greatest(len(toks)-{SHINGLE_N - 1}, 0))]) AS shingle
  FROM tok
)"""

# SQL twin of operators.dedup.minhash_signature: one md5 → 60-bit x,
# then K universal-hash permutations (same constants, same BIGINT
# arithmetic — both engines stay inside signed 64-bit by construction).
MINHASH_SHX_CTE = (
    "shx AS (SELECT doc_id, "
    f"(('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P}) AS x "
    "FROM sh)"
)


def minhash_aggs_sql(k: int) -> str:
    """K min-aggregates of the universal-hash family — generated from
    ``minhash_coeffs`` so any signature width the Spark side can run,
    the oracle can re-derive from ``k`` alone."""
    ca, cb = minhash_coeffs(k)
    return ", ".join(
        f"min((x * {ca[i]} + {cb[i]}) % {MINHASH_P}) AS h{i}"
        for i in range(k)
    )


def band_selects_sql(bands: int, rows: int, src: str = "sig") -> str:
    return " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {cols} AS band_sig FROM {src}".format(
            b=b,
            cols="concat_ws('|', {})".format(
                ", ".join(f"h{b * rows + r}" for r in range(rows))
            ),
            src=src,
        )
        for b in range(bands)
    )
