"""Oracle-checked LLM-pipeline queries (dedup / similarity / text /
multimodal) over the driver's ``documents`` and ``embeddings`` tables.

Approximate operators (MinHash-LSH, SimHash, hyperplane/IVF ANN) have no
DuckDB twin for their raw output — their hash functions aren't portable —
so each registers a *derived deterministic check* instead: the approximate
op runs in full, is compared Spark-side against its exact twin (fixed
seeds), and the query returns a one-row summary of data-derived counts
(value-checked by the oracle) plus quality-bound booleans (oracle-pinned to
TRUE).  The same bounds are pinned pair-level in ``tests/test_llm.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..llm.dedup import (
    dedup_against,
    dedup_exact,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from ..llm.multimodal import extract_features, sample_frames, with_binary_payload
from ..llm.pipeline import (
    chunk_documents,
    clean_corpus,
    corpus_stats,
    decontaminate,
    mixture_sample,
    pack_sequences,
    stratified_sample,
)
from ..llm.similarity import (
    ann_hyperplane_topk,
    ann_ivf_topk,
    cosine_topk,
    cosine_topk_quantized,
    embedding_neardup_exact,
    embedding_neardup_lsh,
)
from ..llm.text import (
    fingerprint,
    lang_id,
    normalize_text,
    pred_lang_col,
    repetition_stats,
    scrub_pii,
    text_stats,
    token_counts,
    top_terms,
)

# Shared shingle CTE (4-gram word shingles, distinct, same construction as
# llm.text.shingles_col).
_SHINGLE_CTE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
s AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 4
              THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ')
                                  for i in range(1, len(w) - 3 + 1)])
              ELSE [] END AS sh
  FROM t
)
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_exact(load_table(spark, sf_dir, "documents"))


DEDUP_EXACT_SQL = """
SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
"""


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return text_stats(load_table(spark, sf_dir, "documents"))


TEXT_STATS_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks, length(text) AS n_chars
  FROM documents
),
c AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CAST(n_chars AS INTEGER) AS n_chars,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stopwords
  FROM t
)
SELECT doc_id, n_tokens, n_chars, n_stopwords,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_word_len,
       CAST(n_stopwords AS DOUBLE) / n_tokens AS stop_ratio,
       least(CAST(n_tokens AS DOUBLE) / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
         + (CAST(1 AS DOUBLE) - CAST(n_stopwords AS DOUBLE) / n_tokens) * CAST(0.5 AS DOUBLE) AS quality
FROM c
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(load_table(spark, sf_dir, "documents"))


LANG_ID_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
sc AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS score_en,
         CAST(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und'))) AS INTEGER) AS score_de,
         CAST(len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et'))) AS INTEGER) AS score_fr,
         CAST(len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y'))) AS INTEGER) AS score_es
  FROM t
)
SELECT doc_id, score_en, score_de, score_fr, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
            WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
            WHEN score_es > 0 THEN 'es'
            ELSE 'unknown' END AS pred_lang
FROM sc
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(load_table(spark, sf_dir, "documents"))


DOC_FINGERPRINT_SQL = (
    _SHINGLE_CTE
    + """
SELECT s.doc_id,
       md5(d.text) AS text_md5,
       list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS min_shingle_md5,
       CAST(len(sh) AS INTEGER) AS n_shingles
FROM s JOIN documents d ON s.doc_id = d.doc_id
"""
)


#: Document-frequency cap for the registered exact-Jaccard query.  This is
#: the skew guard for the inverted-index self-join: a shingle appearing in
#: df documents contributes df·(df−1)/2 candidate pairs and lands on ONE
#: shuffle key, so without a cap a ubiquitous shingle ("in the") makes the
#: hot key quadratic in corpus size.  With the cap, per-shingle join fan-out
#: is bounded by max_df² pairs regardless of corpus scale, and both the
#: co-occurrence counts and the per-doc set sizes are computed on the capped
#: shingle sets (consistent "capped Jaccard" semantics — the standard IR
#: stop-shingle trick).
NGRAM_MAX_DF = 100


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=NGRAM_MAX_DF
    )


DEDUP_NGRAM_SQL = (
    _SHINGLE_CTE
    + f"""
, ex0 AS (
  SELECT doc_id, unnest(sh) AS shingle FROM s
),
dfc AS (
  SELECT shingle, COUNT(*) AS df FROM ex0 GROUP BY shingle
),
ex AS (  -- df-capped inverted index, mirroring shingle_index(max_df={NGRAM_MAX_DF})
  SELECT ex0.doc_id, ex0.shingle
  FROM ex0 JOIN dfc ON ex0.shingle = dfc.shingle
  WHERE dfc.df <= {NGRAM_MAX_DF}
),
sz AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id
),
co AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS co
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT d1, d2, CAST(co AS DOUBLE) / (s1.n_sh + s2.n_sh - co) AS jaccard
FROM co
JOIN sz s1 ON co.d1 = s1.doc_id
JOIN sz s2 ON co.d2 = s2.doc_id
WHERE CAST(co AS DOUBLE) / (s1.n_sh + s2.n_sh - co) >= 0.8
"""
)


def _query_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _query_vectors(spark, sf_dir), k=5)


ANN_COSINE_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
),
sims AS (
  SELECT query_id, vec_id,
         round(list_dot_product(cv, qv)
               / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
  FROM q, c WHERE vec_id <> query_id
),
r AS (
  SELECT query_id, vec_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS INTEGER) AS rank
  FROM sims
)
SELECT query_id, rank, vec_id AS neighbor_id, sim FROM r WHERE rank <= 5
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(with_binary_payload(docs))


MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(strlen(text) AS INTEGER) AS n_bytes,
       CAST(strlen(text) % 640 AS INTEGER) AS fake_width,
       CAST(strlen(text) % 480 AS INTEGER) AS fake_height,
       md5(text) AS checksum
FROM documents
"""

def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (64-byte frames, every 2nd) over the binary payload.

    The mapInPandas 1-to-N fan-out checked value-for-value against a DuckDB
    substring/md5 twin — valid because the fixture text is pure ASCII, so
    byte offsets equal character offsets.
    """
    docs = load_table(spark, sf_dir, "documents")
    frames = sample_frames(with_binary_payload(docs), frame_bytes=64, every=2)
    return frames.select("doc_id", "frame_idx", "frame_checksum")


MULTIMODAL_FRAMES_SQL = """
WITH f AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 2)) AS fi
  FROM documents
)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       md5(substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)) AS frame_checksum
FROM f
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load_table(spark, sf_dir, "documents"))


TOKEN_COUNTS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         string_split(text, ' ') AS ws,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS bpe
  FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS INTEGER) AS n_tokens_ws,
       CAST(len(bpe) AS INTEGER) AS n_tokens_bpe,
       CAST(len(list_distinct(bpe)) AS INTEGER) AS n_distinct_bpe,
       CAST(len(list_distinct(bpe)) AS DOUBLE) / len(bpe) AS distinct_ratio
FROM t
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # threshold low enough that random-ish synthetic embeddings yield pairs
    # (max pairwise cosine in the driver fixtures is ~0.5)
    return embedding_neardup_exact(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


EMBEDDING_NEARDUP_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


# -- approximate operators: derived deterministic checks -----------------------
#
# LSH/IVF hash functions are not portable to DuckDB, so these queries cannot
# oracle-check the raw pair/top-k output.  Instead each runs the FULL
# approximate operator AND its exact twin (both Spark-side, fixed seeds →
# deterministic), then returns a one-row summary the driver CAN hash:
#
# - a data-derived count the DuckDB oracle recomputes independently from the
#   parquet tables (real value check that both engines see the same truth),
# - boolean quality gates (precision/recall vs the exact twin, with the same
#   bounds tests/test_llm.py pins) whose oracle value is the constant TRUE —
#   the row hash-matches iff the approximation meets its bound.
#
# This is the honest checkable form of an approximation: value-equality where
# value-equality is defined (the exact twin), bound-assertion where only a
# bound is defined (the approximate path).
#
# Two hygiene rules keep the checks gate-safe:
#
# - The exact twins whose cost is super-linear (inverted-index Jaccard
#   without a df cap; brute-force O(n²) Hamming) run on a deterministically
#   CAPPED corpus (md5-mod bucket sample, mirrored in the DuckDB twin) so no
#   gate query blows up when the harness raises sf.  The operators
#   themselves stay linear-ish by construction; only the ground-truth twin
#   needed bounding.
# - Each check materializes its one-row summary eagerly and unpersists its
#   cached intermediates before returning: the correctness driver runs all
#   registered queries in one session with no cache hygiene of its own
#   (bench.py clearCache()s between timings; the gate does not), so leaked
#   cache blocks would tax every later query.

# Fraction (of 100 md5 buckets) of documents kept by the capped checks.
# 60 keeps the sf0.01 gate meaningful (10 exact near-dup pairs survive) while
# cutting the quadratic twin's work to ~0.36× and keeping it bounded
# relative to corpus growth.
_CHECK_CAP = 60

_CAP_SQL = (
    "WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)"
    f" % 100) < {_CHECK_CAP}"
)


def _capped_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.pipeline import md5_bucket_col

    return load_table(spark, sf_dir, "documents").filter(
        md5_bucket_col("doc_id") < _CHECK_CAP
    )


def _eager_summary(df: DataFrame, cached: list[DataFrame]) -> DataFrame:
    """Materialize a small summary frame, then unpersist the check's cached
    intermediates so a multi-query driver session doesn't accumulate cache
    blocks across checks.

    The explicit unpersists cover the frames this module cached; the
    operators underneath cache their own internals too (minhash/simhash
    signatures, the shingle inverted index, LSH buckets), so finish with a
    full ``clearCache`` — at this point the check's answer is already a
    local list, and dropping another query's leftover cache only costs it a
    recompute it should not have been relying on.
    """
    rows = df.collect()
    for c in cached:
        c.unpersist()
    df.sparkSession.catalog.clearCache()
    return df.sparkSession.createDataFrame(rows, df.schema)


def _recall_vs_exact(
    qv: DataFrame, approx: DataFrame, exact: DataFrame, threshold: float
) -> DataFrame:
    """Shared recall@k derived-check scaffold for the ANN gate queries
    (flat LSH / IVF / quantized / PQ / IVF-PQ all pin the same property):
    count the exact top-k pairs the approximate index recovers and assert
    ``recall ≥ threshold``, returning the query/pair counts the DuckDB
    oracle recomputes (``_ANN_CHECK_SQL``) plus the pinned boolean."""
    exact = exact.select("query_id", "neighbor_id").persist()
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    n_hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact, ["query_id", "neighbor_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("nh"))
    )
    n_q = qv.agg(F.count(F.lit(1)).alias("n_queries"))
    summary = (
        n_q.crossJoin(n_exact)
        .crossJoin(n_hits)
        .select(
            F.col("n_queries"),
            F.col("n_exact"),
            (F.col("nh") >= threshold * F.col("n_exact")).alias("recall_ok"),
        )
    )
    return _eager_summary(summary, [exact])


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH vs exact n-gram Jaccard: recall ≥ 0.9, precision 1.

    Precision is structural (the verify step computes exact Jaccard on
    candidates), so ``precision_ok`` doubles as a regression check on the
    verify filter; recall is the banding tradeoff, bounded as in
    tests/test_llm.py.  Both sides run on the md5-mod capped corpus: the
    ground-truth twin (`ngram_jaccard_pairs` with ``max_df=None``) is the
    one super-linear plan in the gate, so it gets a bounded input.
    """
    docs = _capped_docs(spark, sf_dir)
    approx = minhash_dedup_pairs(docs, threshold=0.8).select("d1", "d2").persist()
    exact = ngram_jaccard_pairs(docs, threshold=0.8).select("d1", "d2").persist()
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_caught = approx.join(exact, ["d1", "d2"], "left_semi").agg(
        F.count(F.lit(1)).alias("nc")
    )
    n_false = approx.join(exact, ["d1", "d2"], "left_anti").agg(
        F.count(F.lit(1)).alias("nf")
    )
    summary = (
        n_exact.crossJoin(n_caught)
        .crossJoin(n_false)
        .select(
            F.col("n_exact_pairs"),
            (F.col("nf") == 0).alias("precision_ok"),
            (F.col("nc") >= 0.9 * F.col("n_exact_pairs")).alias("recall_ok"),
        )
    )
    return _eager_summary(summary, [approx, exact])


DEDUP_MINHASH_SQL = (
    _SHINGLE_CTE.replace("FROM documents", "FROM documents " + _CAP_SQL, 1)
    + """
, ex AS (
  SELECT doc_id, unnest(sh) AS shingle, len(sh) AS n_sh FROM s
),
co AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS co,
         any_value(a.n_sh) AS n1, any_value(b.n_sh) AS n2
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS precision_ok,
       TRUE AS recall_ok
FROM co WHERE CAST(co AS DOUBLE) / (n1 + n2 - co) >= 0.8
"""
)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash blocking vs brute-force Hamming: completeness is a theorem,
    this checks it empirically.

    The 4-segment pigeonhole guarantees every pair at distance ≤ 3 shares a
    segment, so the blocked pair set must EQUAL the brute-force all-pairs
    set.  The brute-force side is a deliberate O(n²) broadcast nested-loop
    over the (doc_id, 64-bit signature) frame — so it runs on the md5-mod
    capped corpus (the theorem holds on any subset; the scale path is the
    blocked operator it certifies).  ``n_docs_signed`` (capped docs long
    enough to shingle) is the data-derived column the DuckDB oracle
    recomputes.
    """
    docs = _capped_docs(spark, sf_dir)
    sigs = simhash_signatures(docs).persist()
    blocked = simhash_near_pairs(signatures=sigs, max_distance=3).select("d1", "d2").persist()
    a = sigs.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"))
    b = sigs.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"))
    brute = (
        a.join(b, F.col("d1") < F.col("d2"))
        .filter(F.bit_count(F.col("h1").bitwiseXOR(F.col("h2"))) <= 3)
        .select("d1", "d2")
        .persist()
    )
    n_signed = sigs.agg(F.count(F.lit(1)).alias("n_docs_signed"))
    n_blocked = blocked.agg(F.count(F.lit(1)).alias("nb"))
    n_brute = brute.agg(F.count(F.lit(1)).alias("nx"))
    n_missed = brute.join(blocked, ["d1", "d2"], "left_anti").agg(
        F.count(F.lit(1)).alias("nm")
    )
    summary = (
        n_signed.crossJoin(n_blocked)
        .crossJoin(n_brute)
        .crossJoin(n_missed)
        .select(
            F.col("n_docs_signed"),
            ((F.col("nb") == F.col("nx")) & (F.col("nm") == 0)).alias("blocking_complete"),
        )
    )
    return _eager_summary(summary, [sigs, blocked, brute])


DEDUP_SIMHASH_SQL = (
    _SHINGLE_CTE.replace("FROM documents", "FROM documents " + _CAP_SQL, 1)
    + """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs_signed,
       TRUE AS blocking_complete
FROM s WHERE len(sh) > 0
"""
)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH top-k vs exact cosine top-k: recall@5 ≥ 0.5
    (the tests/test_llm.py bound for 8 tables × 4 bits on random vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vectors(spark, sf_dir)
    approx = ann_hyperplane_topk(emb, qv, k=5, n_tables=8, bits_per_table=4)
    return _recall_vs_exact(qv, approx, cosine_topk(emb, qv, k=5), 0.5)


_ANN_CHECK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < 10
),
c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
),
sims AS (
  SELECT query_id, vec_id,
         round(list_dot_product(cv, qv)
               / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))), 6) AS sim
  FROM q, c WHERE vec_id <> query_id
),
r AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM sims
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM q) AS n_queries,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM r WHERE rank <= 5) AS n_exact,
       TRUE AS recall_ok
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k vs exact cosine top-k: recall@5 ≥ 0.5 at nprobe=6/16 cells
    (the tests/test_llm.py bound)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vectors(spark, sf_dir)
    approx = ann_ivf_topk(emb, qv, k=5, n_cells=16, nprobe=6)
    return _recall_vs_exact(qv, approx, cosine_topk(emb, qv, k=5), 0.5)


def q_ann_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-quantized cosine top-k vs the float path: recall@5 ≥ 0.9.

    Quantization error is ≤ ~1/127 per axis, far below typical neighbor
    gaps, so recall should be near-perfect; the 0.9 bound leaves room for
    genuine boundary flips among near-tied neighbors.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vectors(spark, sf_dir)
    approx = cosine_topk_quantized(emb, qv, k=5)
    return _recall_vs_exact(qv, approx, cosine_topk(emb, qv, k=5), 0.9)


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup vs the exact blocked-GEMM twin: recall ≥ 0.8,
    precision 1 (verify step removes false positives).

    Low threshold (0.4) needs short codes + many tables for recall:
    per-table collision probability is (1 − θ/π)^bits, tiny at θ ≈ 66°
    unless bits is small — hence 16 tables × 4 bits.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    approx = (
        embedding_neardup_lsh(emb, threshold=0.4, n_tables=16, bits_per_table=4)
        .select("id1", "id2")
        .persist()
    )
    exact = embedding_neardup_exact(emb, threshold=0.4).select("id1", "id2").persist()
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_pairs"))
    n_caught = approx.join(exact, ["id1", "id2"], "left_semi").agg(
        F.count(F.lit(1)).alias("nc")
    )
    n_false = approx.join(exact, ["id1", "id2"], "left_anti").agg(
        F.count(F.lit(1)).alias("nf")
    )
    summary = (
        n_exact.crossJoin(n_caught)
        .crossJoin(n_false)
        .select(
            F.col("n_exact_pairs"),
            (F.col("nf") == 0).alias("precision_ok"),
            (F.col("nc") >= 0.8 * F.col("n_exact_pairs")).alias("recall_ok"),
        )
    )
    return _eager_summary(summary, [approx, exact])


EMBEDDING_NEARDUP_LSH_SQL = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS precision_ok,
       TRUE AS recall_ok
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
"""


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters, map-only.

    The Spark side finds each doc's most frequent bigram with a row-local
    sorted-run-length pass (no shuffle); the DuckDB twin computes the same
    mode by unnest + GROUP BY — a different algorithm, so the value match
    checks the statistic, not the trick.
    """
    return repetition_stats(load_table(spark, sf_dir, "documents"))


REPETITION_STATS_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 2
              THEN [array_to_string(list_slice(w, i, i + 1), ' ') for i in range(1, len(w))]
              ELSE [] END AS bg,
         CASE WHEN len(w) >= 3
              THEN [array_to_string(list_slice(w, i, i + 2), ' ') for i in range(1, len(w) - 1)]
              ELSE [] END AS tg
  FROM t
),
bx AS (
  SELECT doc_id, unnest(bg) AS g2 FROM g
),
bc AS (
  SELECT doc_id, g2, COUNT(*) AS c FROM bx GROUP BY doc_id, g2
),
bm AS (
  SELECT doc_id, CAST(MAX(c) AS INTEGER) AS max_bigram_count FROM bc GROUP BY doc_id
),
f AS (
  SELECT g.doc_id,
         CAST(len(bg) AS INTEGER) AS n_bigrams,
         COALESCE(bm.max_bigram_count, 0) AS max_bigram_count,
         CASE WHEN len(bg) > 0
              THEN CAST(COALESCE(bm.max_bigram_count, 0) AS DOUBLE) / len(bg)
              ELSE 0.0 END AS max_bigram_frac,
         CASE WHEN len(tg) > 0
              THEN CAST(len(tg) - len(list_distinct(tg)) AS DOUBLE) / len(tg)
              ELSE 0.0 END AS dup_trigram_frac
  FROM g LEFT JOIN bm ON g.doc_id = bm.doc_id
)
SELECT doc_id, n_bigrams, max_bigram_count, max_bigram_frac, dup_trigram_frac,
       (max_bigram_frac <= 0.2 AND dup_trigram_frac <= 0.3) AS gopher_keep
FROM f
"""


#: Window length for the registered exact-substring-dedup query.  16 tokens
#: ≈ the scale of boilerplate/quote repeats in the synthetic corpus (probed:
#: 835 duplicated windows / 1733 occurrences at sf0.01); Lee et al. use 50
#: BPE tokens on real corpora — the operator takes k as a knob.
SUBSTR_K = 16


def q_dedup_substrings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring dedup (``llm/substrings.py``): per-document repeated-
    span summary — duplicated k-windows, merged maximal spans, removable
    token counts.  Full-value oracle: the DuckDB twin recomputes windows by
    position, duplicate hashes, and the identical gaps-and-islands merge."""
    from ..llm.substrings import dedup_substrings

    return dedup_substrings(load_table(spark, sf_dir, "documents"), k=SUBSTR_K)


DEDUP_SUBSTRINGS_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
wins AS (
  SELECT doc_id,
         unnest(CASE WHEN len(w) >= {SUBSTR_K}
                     THEN [i - 1 for i in range(1, len(w) - {SUBSTR_K} + 2)]
                     ELSE [] END) AS pos,
         unnest(CASE WHEN len(w) >= {SUBSTR_K}
                     THEN [md5(array_to_string(list_slice(w, i, i + {SUBSTR_K} - 1), ' '))
                           for i in range(1, len(w) - {SUBSTR_K} + 2)]
                     ELSE [] END) AS wh
  FROM t
),
dupm AS (
  SELECT wins.doc_id, wins.pos
  FROM wins
  JOIN (SELECT wh FROM wins GROUP BY wh HAVING COUNT(*) >= 2) d USING (wh)
),
m AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL
                OR pos - lag(pos) OVER w > {SUBSTR_K}
              THEN 1 ELSE 0 END AS new_span
  FROM dupm
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
sp AS (
  SELECT doc_id, pos,
         SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS span
  FROM m
),
per_span AS (
  SELECT doc_id, span, COUNT(*) AS n_win,
         MAX(pos) + {SUBSTR_K} - MIN(pos) AS covered
  FROM sp GROUP BY doc_id, span
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(n_win) AS BIGINT) AS n_dup_windows,
         COUNT(*) AS n_spans,
         CAST(SUM(covered) AS BIGINT) AS n_tokens_removed
  FROM per_span GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(w) AS INTEGER) AS n_tokens,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(n_tokens_removed, 0) AS n_tokens_removed,
       CAST(COALESCE(n_tokens_removed, 0) AS DOUBLE) / len(w) AS removed_ratio
FROM t LEFT JOIN per_doc ON t.doc_id = per_doc.doc_id
"""


def q_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full per-document text profile — stats/quality, language-ID, BPE token
    counts, fingerprint, Gopher repetition, normalization, PII scrub — as ONE
    map-only projection (driver-gate footprint consolidation, VERDICT r3 #5).

    One driver row value-certifies seven SURVEY §2 text operators at once;
    every operator keeps its standalone function (``llm/text.py``) and pytest
    coverage.  Plan shape: tokenize / n-gram / shingle ONCE into shared array
    columns, then every statistic reads those arrays — strictly cheaper than
    the seven standalone scans, still zero shuffles, fully codegen'd.

    The normalization and scrub halves run over the same deterministically
    dirtied inputs the standalone queries used (``q_normalize_text`` /
    ``q_scrub_pii``), built inline as expressions both engines reproduce.
    """
    from ..llm.text import (
        CONTROL_CHARS_RE,
        EMAIL_RE,
        IPV4_RE,
        LANG_MARKERS,
        LONG_NUM_RE,
        STOPWORDS,
        WHITESPACE_RUN_RE,
        _max_run_count,
        bpe_tokens_col,
        ngrams_col,
        shingles_col,
        tokens_col,
    )
    from ..llm.util import spread

    docs = spread(load_table(spark, sf_dir, "documents"))
    messy = F.concat(F.lit("  "), F.upper("text"), F.lit("\x01"), F.lit(" EnD  "))
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 ref 99887766"),
        F.col("doc_id").cast("string"),
    )
    base = docs.select(
        "doc_id",
        "text",
        tokens_col("text").alias("ws"),
        bpe_tokens_col("text").alias("bpe"),
        shingles_col("text", 4).alias("sh"),
        ngrams_col("text", 2).alias("bg"),
        ngrams_col("text", 3).alias("tg"),
        messy.alias("messy"),
        planted.alias("planted"),
    )

    def marker(markers: list[str]):
        # single-param lambda only: F.filter treats a 2-param lambda as the
        # (element, index) form, so a captured-default second arg would bind
        # the array index, not the marker list
        ms = list(markers)
        return F.size(F.filter(F.col("ws"), lambda t: t.isin(ms)))

    norm = F.trim(
        F.regexp_replace(
            F.lower(F.regexp_replace(F.col("messy"), CONTROL_CHARS_RE, " ")),
            WHITESPACE_RUN_RE,
            " ",
        )
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("planted"), EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        LONG_NUM_RE,
        "<NUM>",
    )
    mid = base.select(
        "doc_id",
        F.size("ws").alias("n_tokens"),
        F.length("text").alias("n_chars"),
        marker(STOPWORDS).alias("n_stopwords"),
        *[marker(m).alias(f"score_{lang}") for lang, m in LANG_MARKERS.items()],
        F.size("bpe").alias("n_tokens_bpe"),
        F.size(F.array_distinct("bpe")).alias("n_distinct_bpe"),
        F.md5("text").alias("text_md5"),
        F.array_min(F.transform(F.col("sh"), F.md5)).alias("min_shingle_md5"),
        F.size("sh").alias("n_shingles"),
        F.size("bg").alias("n_bigrams"),
        _max_run_count(F.col("bg")).alias("max_bigram_count"),
        F.size("tg").alias("n_tg"),
        F.size(F.array_distinct("tg")).alias("n_tg_distinct"),
        norm.alias("norm_text"),
        (norm != F.col("messy")).alias("changed"),
        scrubbed.alias("clean_text"),
        F.size(F.regexp_extract_all(F.col("planted"), F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(F.col("planted"), F.lit(IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(F.col("planted"), F.lit(LONG_NUM_RE), 0)).alias(
            "n_long_nums"
        ),
    )
    # Derived doubles reproduce the standalone operators' exact expression
    # order so values are bit-identical to text_stats/repetition_stats.
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens")
    quality = (
        F.least(F.col("n_tokens").cast("double") / F.lit(64.0), F.lit(1.0)) * F.lit(0.5)
        + (F.lit(1.0) - stop_ratio) * F.lit(0.5)
    )
    max_frac = F.when(
        F.col("n_bigrams") > 0,
        F.col("max_bigram_count").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("n_tg") > 0,
        (F.col("n_tg") - F.col("n_tg_distinct")).cast("double") / F.col("n_tg"),
    ).otherwise(F.lit(0.0))
    en, de, fr, es = (F.col(f"score_{lang}") for lang in ("en", "de", "fr", "es"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )
    return mid.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        "n_stopwords",
        ((F.col("n_chars") - (F.col("n_tokens") - F.lit(1))).cast("double") / F.col("n_tokens")).alias("avg_word_len"),
        stop_ratio.alias("stop_ratio"),
        quality.alias("quality"),
        "score_en",
        "score_de",
        "score_fr",
        "score_es",
        pred.alias("pred_lang"),
        "n_tokens_bpe",
        "n_distinct_bpe",
        (F.col("n_distinct_bpe").cast("double") / F.col("n_tokens_bpe")).alias("distinct_ratio"),
        "text_md5",
        "min_shingle_md5",
        "n_shingles",
        "n_bigrams",
        "max_bigram_count",
        max_frac.alias("max_bigram_frac"),
        dup_frac.alias("dup_trigram_frac"),
        ((max_frac <= F.lit(0.2)) & (dup_frac <= F.lit(0.3))).alias("gopher_keep"),
        "norm_text",
        F.length("norm_text").alias("n_chars_norm"),
        "changed",
        "clean_text",
        "n_emails",
        "n_ips",
        "n_long_nums",
    )


TEXT_PROFILE_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         string_split(text, ' ') AS w,
         regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]') AS bpe,
         '  ' || upper(text) || chr(1) || ' EnD  ' AS mt,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7 ref 99887766' || doc_id AS pt
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 4
              THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ')
                                  for i in range(1, len(w) - 3 + 1)])
              ELSE [] END AS sh,
         CASE WHEN len(w) >= 2
              THEN [array_to_string(list_slice(w, i, i + 1), ' ') for i in range(1, len(w))]
              ELSE [] END AS bg,
         CASE WHEN len(w) >= 3
              THEN [array_to_string(list_slice(w, i, i + 2), ' ') for i in range(1, len(w) - 1)]
              ELSE [] END AS tg
  FROM t
),
bx AS (SELECT doc_id, unnest(bg) AS g2 FROM g),
bc AS (SELECT doc_id, g2, COUNT(*) AS c FROM bx GROUP BY doc_id, g2),
bm AS (SELECT doc_id, CAST(MAX(c) AS INTEGER) AS max_bigram_count FROM bc GROUP BY doc_id),
base AS (
  SELECT t.doc_id,
         CAST(len(w) AS INTEGER) AS n_tokens,
         CAST(length(t.text) AS INTEGER) AS n_chars,
         CAST(len(list_filter(w, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stopwords,
         CAST(len(list_filter(w, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS score_en,
         CAST(len(list_filter(w, x -> x IN ('der', 'die', 'das', 'und'))) AS INTEGER) AS score_de,
         CAST(len(list_filter(w, x -> x IN ('le', 'la', 'les', 'et'))) AS INTEGER) AS score_fr,
         CAST(len(list_filter(w, x -> x IN ('el', 'los', 'las', 'y'))) AS INTEGER) AS score_es,
         CAST(len(bpe) AS INTEGER) AS n_tokens_bpe,
         CAST(len(list_distinct(bpe)) AS INTEGER) AS n_distinct_bpe,
         md5(t.text) AS text_md5,
         list_aggregate(list_transform(sh, x -> md5(x)), 'min') AS min_shingle_md5,
         CAST(len(sh) AS INTEGER) AS n_shingles,
         CAST(len(bg) AS INTEGER) AS n_bigrams,
         COALESCE(bm.max_bigram_count, 0) AS max_bigram_count,
         CAST(len(tg) AS INTEGER) AS n_tg,
         CAST(len(list_distinct(tg)) AS INTEGER) AS n_tg_distinct,
         trim(regexp_replace(lower(regexp_replace(mt, '[\x00-\x1f\x7f]', ' ', 'g')),
                             '\s+', ' ', 'g')) AS norm_text,
         mt, pt
  FROM t JOIN g ON t.doc_id = g.doc_id LEFT JOIN bm ON t.doc_id = bm.doc_id
)
SELECT doc_id, n_tokens, n_chars, n_stopwords,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_word_len,
       CAST(n_stopwords AS DOUBLE) / n_tokens AS stop_ratio,
       least(CAST(n_tokens AS DOUBLE) / CAST(64 AS DOUBLE), CAST(1 AS DOUBLE)) * CAST(0.5 AS DOUBLE)
         + (CAST(1 AS DOUBLE) - CAST(n_stopwords AS DOUBLE) / n_tokens) * CAST(0.5 AS DOUBLE) AS quality,
       score_en, score_de, score_fr, score_es,
       CASE WHEN score_en >= score_de AND score_en >= score_fr AND score_en >= score_es AND score_en > 0 THEN 'en'
            WHEN score_de >= score_fr AND score_de >= score_es AND score_de > 0 THEN 'de'
            WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
            WHEN score_es > 0 THEN 'es'
            ELSE 'unknown' END AS pred_lang,
       n_tokens_bpe, n_distinct_bpe,
       CAST(n_distinct_bpe AS DOUBLE) / n_tokens_bpe AS distinct_ratio,
       text_md5, min_shingle_md5, n_shingles,
       n_bigrams, max_bigram_count,
       CASE WHEN n_bigrams > 0 THEN CAST(max_bigram_count AS DOUBLE) / n_bigrams
            ELSE 0.0 END AS max_bigram_frac,
       CASE WHEN n_tg > 0 THEN CAST(n_tg - n_tg_distinct AS DOUBLE) / n_tg
            ELSE 0.0 END AS dup_trigram_frac,
       (CASE WHEN n_bigrams > 0 THEN CAST(max_bigram_count AS DOUBLE) / n_bigrams
             ELSE 0.0 END <= 0.2
        AND CASE WHEN n_tg > 0 THEN CAST(n_tg - n_tg_distinct AS DOUBLE) / n_tg
                 ELSE 0.0 END <= 0.3) AS gopher_keep,
       norm_text,
       CAST(length(norm_text) AS INTEGER) AS n_chars_norm,
       (norm_text <> mt) AS changed,
       regexp_replace(
         regexp_replace(
           regexp_replace(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
         '\b\d{7,}\b', '<NUM>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(pt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(pt, '\b\d{7,}\b')) AS INTEGER) AS n_long_nums
FROM base
"""


def q_multimodal_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction + frame sampling + REAL image decode over the
    binary payload as one tagged union (driver-gate footprint consolidation,
    VERDICT r3 #5).

    Three multimodal operators in one oracle row: ``extract_features``
    (per-doc metadata), ``sample_frames`` (1-to-N mapInPandas fan-out), and
    the ``synthesize_ppm_images`` → ``decode_features`` pair — each document
    becomes a valid binary PPM whose bytes the stdlib decoder
    (``llm/multimodal.py: decode_image``) parses back; the oracle recomputes
    decoded width/height/pixel-checksum from first principles, so a hash
    match certifies the decoder's header parse and raster extraction, not
    just byte plumbing.  All keep standalone functions + pytest coverage
    (``llm/multimodal.py``, ``tests/test_llm.py``).

    Round 5 adds two more REAL-codec branches: ``resized`` (nearest-
    neighbor resize to 8×6 through the real decoder — the oracle recomputes
    every picked pixel with the same floor mapping) and ``audio`` (each
    document becomes a genuine RIFF/WAV container that the stdlib ``wave``
    reader parses back; exact int64 amplitude sums certify every sample).
    """
    from ..llm.multimodal import (
        decode_features,
        decode_wav_stats,
        resize_decoded_images,
        synthesize_ppm_images,
        synthesize_wav_audio,
    )

    docs = with_binary_payload(load_table(spark, sf_dir, "documents"))
    feats = extract_features(docs).select(
        F.lit("features").alias("op"),
        "doc_id",
        F.col("n_bytes").alias("v1"),
        F.col("fake_width").alias("v2"),
        F.col("fake_height").alias("v3"),
        "checksum",
    )
    frames = sample_frames(docs, frame_bytes=64, every=2).select(
        F.lit("frames").alias("op"),
        "doc_id",
        F.col("frame_idx").alias("v1"),
        F.lit(None).cast("int").alias("v2"),
        F.lit(None).cast("int").alias("v3"),
        F.col("frame_checksum").alias("checksum"),
    )
    ppm = synthesize_ppm_images(docs)
    decoded = decode_features(ppm).select(
        F.lit("decoded").alias("op"),
        "doc_id",
        F.col("n_pixels").alias("v1"),
        F.col("width").alias("v2"),
        F.col("height").alias("v3"),
        F.col("pixel_checksum").alias("checksum"),
    )
    resized = decode_features(resize_decoded_images(ppm, 8, 6)).select(
        F.lit("resized").alias("op"),
        "doc_id",
        F.col("n_pixels").alias("v1"),
        F.col("width").alias("v2"),
        F.col("height").alias("v3"),
        F.col("pixel_checksum").alias("checksum"),
    )
    audio = decode_wav_stats(synthesize_wav_audio(docs)).select(
        F.lit("audio").alias("op"),
        "doc_id",
        F.col("n_samples").alias("v1"),
        F.col("framerate").alias("v2"),
        F.col("n_channels").alias("v3"),
        F.md5(F.concat_ws(":", F.col("amp_sum"), F.col("amp_sqsum"))).alias("checksum"),
    )
    return (
        feats.unionByName(frames)
        .unionByName(decoded)
        .unionByName(resized)
        .unionByName(audio)
    )


# The 'decoded' twin derives what the real decoder must output: w = n%16+1,
# h = n%12+1 (synth_ppm_payload's dimension rule), pixels = the utf-8 text
# cycled to 3wh bytes (ASCII fixture text → byte ops == char ops in DuckDB).
MULTIMODAL_OPS_SQL = """
SELECT 'features' AS op, doc_id,
       CAST(strlen(text) AS INTEGER) AS v1,
       CAST(strlen(text) % 640 AS INTEGER) AS v2,
       CAST(strlen(text) % 480 AS INTEGER) AS v3,
       md5(text) AS checksum
FROM documents
UNION ALL
SELECT 'frames' AS op, doc_id,
       CAST(fi AS INTEGER) AS v1,
       CAST(NULL AS INTEGER) AS v2,
       CAST(NULL AS INTEGER) AS v3,
       md5(substring(text, CAST(fi * 64 + 1 AS BIGINT), 64)) AS checksum
FROM (
  SELECT doc_id, text,
         unnest(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 2)) AS fi
  FROM documents
) f
UNION ALL
SELECT 'decoded' AS op, doc_id,
       CAST(w * h AS INTEGER) AS v1,
       CAST(w AS INTEGER) AS v2,
       CAST(h AS INTEGER) AS v3,
       md5(substring(repeat(text, CAST(ceil(3.0 * w * h / n) AS BIGINT)), 1, 3 * w * h))
         AS checksum
FROM (
  SELECT doc_id, text, strlen(text) AS n,
         strlen(text) % 16 + 1 AS w, strlen(text) % 12 + 1 AS h
  FROM documents
) d
UNION ALL
-- 'resized': nearest-neighbor 8x6 — pixel (r,c) of the output comes from
-- source pixel (r*h//6, c*w//8); rebuild the picked raster byte-for-byte
SELECT 'resized' AS op, doc_id,
       CAST(48 AS INTEGER) AS v1,
       CAST(8 AS INTEGER) AS v2,
       CAST(6 AS INTEGER) AS v3,
       md5(string_agg(px, '' ORDER BY i)) AS checksum
FROM (
  SELECT d.doc_id, i.i AS i,
         substring(
           d.raster,
           3 * ((((i.i // 8) * d.h) // 6) * d.w + (((i.i % 8) * d.w) // 8)) + 1,
           3
         ) AS px
  FROM (
    SELECT doc_id,
           strlen(text) % 16 + 1 AS w,
           strlen(text) % 12 + 1 AS h,
           substring(
             repeat(text, CAST(ceil(3.0 * (strlen(text) % 16 + 1)
                                    * (strlen(text) % 12 + 1)
                                    / strlen(text)) AS BIGINT)),
             1,
             3 * (strlen(text) % 16 + 1) * (strlen(text) % 12 + 1)
           ) AS raster
    FROM documents
  ) d
  CROSS JOIN (SELECT unnest(range(48)) AS i) i
) p
GROUP BY doc_id
UNION ALL
-- 'audio': each text byte b becomes PCM sample (b-128)*256 inside a real
-- WAV container; exact integer sums certify every decoded sample
SELECT 'audio' AS op, doc_id,
       CAST(n AS INTEGER) AS v1,
       CAST(16000 AS INTEGER) AS v2,
       CAST(1 AS INTEGER) AS v3,
       md5(CAST(amp_sum AS VARCHAR) || ':' || CAST(amp_sqsum AS VARCHAR))
         AS checksum
FROM (
  SELECT doc_id, MIN(n) AS n,
         CAST(SUM((c - 128) * 256) AS BIGINT) AS amp_sum,
         CAST(SUM(((c - 128) * 256) * ((c - 128) * 256)) AS BIGINT) AS amp_sqsum
  FROM (
    SELECT doc_id, strlen(text) AS n,
           ascii(substring(text, CAST(i AS BIGINT), 1)) AS c
    FROM (SELECT doc_id, text, unnest(range(1, strlen(text) + 1)) AS i
          FROM documents)
  )
  GROUP BY doc_id
) a
"""


#: Fixed query-term set for the registered BM25 query (corpus-vocabulary
#: words with different document frequencies → distinct idf weights).
BM25_TERMS = ["spark", "window", "merge"]

#: Phrase for the positional-index search query (distinct tokens, so
#: occurrences cannot overlap and counts are unambiguous).
PHRASE = "table value"


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase occurrence counts via positional inverted-index joins
    (``llm/search.py: phrase_search``): postings are term-filtered BEFORE
    any join, so cost scales with posting-list sizes, not corpus size.
    The oracle recomputes positions through DuckDB's indexed-lambda list
    machinery — an independent positional formulation."""
    from ..llm.search import phrase_search

    return phrase_search(load_table(spark, sf_dir, "documents"), PHRASE)


PHRASE_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_transform(string_split(text, ' '),
                (t, i) -> struct_pack(term := t, pos := i))) AS tp
  FROM documents
)
SELECT a.doc_id, COUNT(*) AS n_matches
FROM (SELECT doc_id, tp.pos AS p FROM toks WHERE tp.term = 'table') a
JOIN (SELECT doc_id, tp.pos AS p FROM toks WHERE tp.term = 'value') b
  ON a.doc_id = b.doc_id AND b.p = a.p + 1
GROUP BY 1
"""


def q_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document for a fixed 3-term query
    (llm/search.py) — one stats aggregate + one map-only scoring pass."""
    from ..llm.search import bm25_scores

    return bm25_scores(load_table(spark, sf_dir, "documents"), BM25_TERMS)


BM25_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
         CAST(SUM(len(toks)) AS DOUBLE) AS total_len,
         CAST(SUM(CASE WHEN list_contains(toks, 'spark') THEN 1 ELSE 0 END) AS DOUBLE) AS df_0,
         CAST(SUM(CASE WHEN list_contains(toks, 'window') THEN 1 ELSE 0 END) AS DOUBLE) AS df_1,
         CAST(SUM(CASE WHEN list_contains(toks, 'merge') THEN 1 ELSE 0 END) AS DOUBLE) AS df_2
  FROM t
),
scored AS (
  SELECT t.doc_id,
         CAST(len(list_filter(toks, x -> x = 'spark')) AS DOUBLE) AS tf_0,
         CAST(len(list_filter(toks, x -> x = 'window')) AS DOUBLE) AS tf_1,
         CAST(len(list_filter(toks, x -> x = 'merge')) AS DOUBLE) AS tf_2,
         CAST(len(toks) AS DOUBLE) AS dl,
         s.*
  FROM t, stats s
),
f AS (
  SELECT doc_id,
         (CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END
          + CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END
          + CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS n_matched,
         ln((n_docs - df_0 + 0.5) / (df_0 + 0.5) + 1.0)
           * tf_0 * 2.2 / (tf_0 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total_len / n_docs)))
         + ln((n_docs - df_1 + 0.5) / (df_1 + 0.5) + 1.0)
           * tf_1 * 2.2 / (tf_1 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total_len / n_docs)))
         + ln((n_docs - df_2 + 0.5) / (df_2 + 0.5) + 1.0)
           * tf_2 * 2.2 / (tf_2 + 1.2 * (1.0 - 0.75 + 0.75 * dl / (total_len / n_docs)))
           AS raw_score
  FROM scored
)
SELECT doc_id, n_matched, round(raw_score, 6) AS score
FROM f WHERE n_matched > 0
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text normalization over deterministically-dirtied input.

    The parquet corpus is already clean, so the query first degrades each
    text (leading spaces, uppercasing, a control char, a messy suffix) with
    expressions both engines reproduce, then asserts the codegen'd
    normalize pass restores canonical form.
    """
    docs = load_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("  "), F.upper("text"), F.lit("\x01"), F.lit(" EnD  ")
        ).alias("text"),
    )
    return normalize_text(messy)


NORMALIZE_TEXT_SQL = r"""
WITH messy AS (
  SELECT doc_id, '  ' || upper(text) || chr(1) || ' EnD  ' AS mt FROM documents
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(lower(regexp_replace(mt, '[\x00-\x1f\x7f]', ' ', 'g')),
                             '\s+', ' ', 'g')) AS norm_text,
         mt
  FROM messy
)
SELECT doc_id, norm_text,
       CAST(length(norm_text) AS INTEGER) AS n_chars_norm,
       (norm_text <> mt) AS changed
FROM n
"""


def q_scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over planted, doc_id-derived emails / IPs / digit runs —
    the oracle regenerates the same plants and runs byte-identical RE2/Java
    portable regexes, so redaction and counts are value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 ref 99887766"),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    return scrub_pii(planted)


SCRUB_PII_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         text || ' contact user' || doc_id || '@example.com from 10.0.'
              || (doc_id % 256) || '.7 ref 99887766' || doc_id AS pt
  FROM documents
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
         '\b\d{7,}\b', '<NUM>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(pt, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(pt, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ips,
       CAST(len(regexp_extract_all(pt, '\b\d{7,}\b')) AS INTEGER) AS n_long_nums
FROM planted
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → connected components → canonical-doc clusters.

    The full pairs-to-clusters chain: capped n-gram Jaccard pairs (same
    parameters as ``dedup_ngram_jaccard``) feed min-label-propagation
    connected components; every clustered document comes back labeled with
    its component's smallest doc_id and a canonical flag.  The DuckDB twin
    recomputes the components with a recursive reachability CTE — a wholly
    different algorithm, so a value match checks the clustering itself, not
    the implementation.
    """
    from ..llm.graph import dedup_clusters

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=NGRAM_MAX_DF
    )
    return dedup_clusters(pairs)


# Shared recursive-CTE chain: documents → capped shingle index → Jaccard
# pairs → undirected reachability (`reach`).  Suffixed by the clusters
# query (min-label components) and the keep-best query (quality argmax per
# component) below.
_CLUSTER_CTES = (
    _SHINGLE_CTE.replace("WITH t AS", "WITH RECURSIVE t AS", 1)
    + f"""
, ex0 AS (
  SELECT doc_id, unnest(sh) AS shingle FROM s
),
dfc AS (
  SELECT shingle, COUNT(*) AS df FROM ex0 GROUP BY shingle
),
ex AS (
  SELECT ex0.doc_id, ex0.shingle
  FROM ex0 JOIN dfc ON ex0.shingle = dfc.shingle
  WHERE dfc.df <= {NGRAM_MAX_DF}
),
sz AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM ex GROUP BY doc_id
),
co AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS co
  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT d1, d2
  FROM co JOIN sz s1 ON co.d1 = s1.doc_id JOIN sz s2 ON co.d2 = s2.doc_id
  WHERE CAST(co AS DOUBLE) / (s1.n_sh + s2.n_sh - co) >= 0.8
),
edges AS (
  SELECT d1 AS es, d2 AS et FROM pairs
  UNION ALL
  SELECT d2 AS es, d1 AS et FROM pairs
),
vtx AS (
  SELECT DISTINCT es AS node FROM edges
),
reach AS (
  SELECT node, node AS r FROM vtx
  UNION
  SELECT rr.node, e.et AS r FROM reach rr JOIN edges e ON rr.r = e.es
)
"""
)

DEDUP_CLUSTERS_SQL = (
    _CLUSTER_CTES
    + """
SELECT node AS doc_id, MIN(r) AS cluster_id, (node = MIN(r)) AS is_canonical
FROM reach GROUP BY node
"""
)


def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as ``dedup_clusters`` computed by the alternating
    large-star/small-star algorithm (``llm/graph.py:
    connected_components_star``, O(log n) rounds on any graph shape).  Same
    recursive-CTE oracle — a hash match proves the two CC algorithms and
    DuckDB's reachability all agree on the partition."""
    from ..llm.graph import dedup_clusters

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), threshold=0.8, max_df=NGRAM_MAX_DF
    )
    return dedup_clusters(pairs, algorithm="star")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware survivor selection (``llm/graph.py: dedup_keep_best``):
    per near-dup cluster keep the highest-quality member, singletons pass
    through.  The DuckDB twin recomputes clusters via recursive
    reachability and the winner via a window — full-value oracle."""
    from ..llm.graph import dedup_keep_best
    from ..llm.text import quality_col

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.8, max_df=NGRAM_MAX_DF)
    return dedup_keep_best(docs, pairs, quality_col())


DEDUP_KEEP_BEST_SQL = (
    _CLUSTER_CTES
    + """
, comp AS (
  SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
),
qual AS (
  SELECT doc_id,
         least(CAST(len(w) AS DOUBLE) / 64.0, 1.0) * 0.5
           + (1.0 - CAST(len(list_filter(w, x -> x IN ('the', 'a', 'and', 'of'))) AS DOUBLE)
                    / len(w)) * 0.5 AS quality
  FROM t
),
best AS (
  SELECT doc_id, cluster_id, 'best_of_cluster' AS kept_reason
  FROM (
    SELECT c.doc_id, c.cluster_id,
           row_number() OVER (PARTITION BY c.cluster_id
                              ORDER BY q.quality DESC, c.doc_id) AS rn
    FROM comp c JOIN qual q ON c.doc_id = q.doc_id
  )
  WHERE rn = 1
)
SELECT d.doc_id, CAST(NULL AS BIGINT) AS cluster_id, 'singleton' AS kept_reason
FROM documents d LEFT JOIN comp ON d.doc_id = comp.doc_id
WHERE comp.doc_id IS NULL
UNION ALL
SELECT doc_id, cluster_id, kept_reason FROM best
"""
)


# -- composed training-data pipeline stages (llm/pipeline.py) ------------------


def q_docs_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/FineWeb-style chain: lang filter → quality floor → exact dedup →
    near-dup removal (capped n-gram Jaccard).  Fully SQL-expressible, so the
    whole composition is value-checked end to end."""
    return clean_corpus(
        load_table(spark, sf_dir, "documents"),
        lang="en",
        min_quality=0.5,
        jaccard_threshold=0.8,
        max_df=NGRAM_MAX_DF,
    )


DOCS_CLEAN_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
lid AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS s_en,
         CAST(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und'))) AS INTEGER) AS s_de,
         CAST(len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et'))) AS INTEGER) AS s_fr,
         CAST(len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y'))) AS INTEGER) AS s_es
  FROM t
),
pl AS (
  SELECT doc_id,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
              WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
              WHEN s_es > 0 THEN 'es'
              ELSE 'unknown' END AS pred_lang
  FROM lid
),
st AS (
  SELECT doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS n_stop,
         length(text) AS n_chars
  FROM t
),
q AS (
  SELECT doc_id, n_tokens,
         least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) * 0.5
           + (1.0 - CAST(n_stop AS DOUBLE) / n_tokens) * 0.5 AS quality
  FROM st
),
base AS (
  SELECT t.doc_id, t.text, pl.pred_lang, q.quality, q.n_tokens
  FROM t JOIN pl ON t.doc_id = pl.doc_id JOIN q ON t.doc_id = q.doc_id
  WHERE pl.pred_lang = 'en' AND q.quality >= 0.5
),
ex AS (
  SELECT min(doc_id) AS doc_id FROM base GROUP BY text
),
kept AS (
  SELECT b.* FROM base b JOIN ex ON b.doc_id = ex.doc_id
),
ks AS (
  SELECT doc_id,
         CASE WHEN len(string_split(text, ' ')) >= 4
              THEN list_distinct([array_to_string(list_slice(string_split(text, ' '), i, i + 3), ' ')
                                  for i in range(1, len(string_split(text, ' ')) - 3 + 1)])
              ELSE [] END AS sh
  FROM kept
),
ex0 AS (
  SELECT doc_id, unnest(sh) AS shingle FROM ks
),
dfc AS (
  SELECT shingle, COUNT(*) AS df FROM ex0 GROUP BY shingle
),
exc AS (
  SELECT ex0.doc_id, ex0.shingle
  FROM ex0 JOIN dfc ON ex0.shingle = dfc.shingle
  WHERE dfc.df <= {NGRAM_MAX_DF}
),
sz AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM exc GROUP BY doc_id
),
co AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS co
  FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
near AS (
  SELECT DISTINCT co.d2 AS doc_id
  FROM co JOIN sz s1 ON co.d1 = s1.doc_id JOIN sz s2 ON co.d2 = s2.doc_id
  WHERE CAST(co AS DOUBLE) / (s1.n_sh + s2.n_sh - co) >= 0.8
)
SELECT k.doc_id, k.pred_lang, k.quality, k.n_tokens
FROM kept k LEFT JOIN near n ON k.doc_id = n.doc_id
WHERE n.doc_id IS NULL
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic md5-mod stratified sample: 30% of 'en', 10% of anything
    else — engine-portable (md5 is bit-identical everywhere), retry-stable
    (no rand())."""
    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs.select("doc_id", pred_lang_col().alias("pred_lang")),
        strata_col="pred_lang",
        rates={"en": 30},
        default_pct=10,
    ).select("doc_id", "pred_lang")


STRATIFIED_SAMPLE_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
lid AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS s_en,
         CAST(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und'))) AS INTEGER) AS s_de,
         CAST(len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et'))) AS INTEGER) AS s_fr,
         CAST(len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y'))) AS INTEGER) AS s_es
  FROM t
),
pl AS (
  SELECT doc_id,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
              WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
              WHEN s_es > 0 THEN 'es'
              ELSE 'unknown' END AS pred_lang
  FROM lid
),
b AS (
  SELECT doc_id, pred_lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS bucket
  FROM pl
)
SELECT doc_id, pred_lang FROM b
WHERE bucket < CASE WHEN pred_lang = 'en' THEN 30 ELSE 10 END
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs sharing any 8-gram with the
    5% md5-bucket benchmark split (broadcast shingle-index probe)."""
    return decontaminate(load_table(spark, sf_dir, "documents"), benchmark_pct=5, n=8)


DECONTAMINATE_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 AS bucket
  FROM documents
),
s AS (
  SELECT doc_id, bucket,
         CASE WHEN len(w) >= 8
              THEN list_distinct([array_to_string(list_slice(w, i, i + 7), ' ')
                                  for i in range(1, len(w) - 6)])
              ELSE [] END AS sh
  FROM t
),
bench AS (
  SELECT doc_id AS bench_id, unnest(sh) AS shingle FROM s WHERE bucket < 5
),
train AS (
  SELECT doc_id, unnest(sh) AS shingle FROM s WHERE bucket >= 5
)
SELECT train.doc_id,
       CAST(COUNT(DISTINCT train.shingle) AS BIGINT) AS n_overlap_ngrams,
       CAST(COUNT(DISTINCT bench.bench_id) AS BIGINT) AS n_benchmark_docs
FROM train JOIN bench ON train.shingle = bench.shingle
GROUP BY train.doc_id
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard sequence packing at 256 tokens (window cumsum, no global
    sort); value-checked against a window-SQL twin."""
    return pack_sequences(
        load_table(spark, sf_dir, "documents"), seq_len=256, shard_col="source"
    )


PACK_SEQUENCES_SQL = """
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id) - n_tokens AS BIGINT)
           AS token_start
  FROM t
)
SELECT doc_id, source, n_tokens, token_start,
       CAST(floor(token_start / 256.0) AS BIGINT) AS seq_id,
       floor(token_start / 256.0) <> floor((token_start + n_tokens - 1) / 256.0)
         AS crosses_boundary
FROM c
"""


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus roll-up with an exact interpolated median."""
    return corpus_stats(load_table(spark, sf_dir, "documents")).select(
        "pred_lang",
        "n_docs",
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "avg_quality",
        "median_tokens",
    )


CORPUS_STATS_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
),
lid AS (
  SELECT doc_id,
         CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS INTEGER) AS s_en,
         CAST(len(list_filter(toks, x -> x IN ('der', 'die', 'das', 'und'))) AS INTEGER) AS s_de,
         CAST(len(list_filter(toks, x -> x IN ('le', 'la', 'les', 'et'))) AS INTEGER) AS s_fr,
         CAST(len(list_filter(toks, x -> x IN ('el', 'los', 'las', 'y'))) AS INTEGER) AS s_es
  FROM t
),
pl AS (
  SELECT doc_id,
         CASE WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en > 0 THEN 'en'
              WHEN s_de >= s_fr AND s_de >= s_es AND s_de > 0 THEN 'de'
              WHEN s_fr >= s_es AND s_fr > 0 THEN 'fr'
              WHEN s_es > 0 THEN 'es'
              ELSE 'unknown' END AS pred_lang
  FROM lid
),
st AS (
  SELECT t.doc_id,
         CAST(len(toks) AS INTEGER) AS n_tokens,
         least(CAST(len(toks) AS DOUBLE) / 64.0, 1.0) * 0.5
           + (1.0 - CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS DOUBLE) / len(toks)) * 0.5 AS quality
  FROM t
)
SELECT pl.pred_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(st.n_tokens) AS BIGINT) AS total_tokens,
       round(AVG(st.quality), 6) AS avg_quality,
       quantile_cont(st.n_tokens, 0.5) AS median_tokens
FROM pl JOIN st ON pl.doc_id = st.doc_id
GROUP BY pl.pred_lang
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus incremental dedup (``llm/dedup.py: dedup_against``).

    The documents table is split deterministically (md5-mod bucket) into an
    "existing corpus" (60%) and a "new crawl" (40%); each new doc is flagged
    for exact and near (Jaccard ≥ 0.8, df-capped shingle index) duplication
    against the existing side only.  Full-value oracle: DuckDB repeats the
    split and both checks exactly.
    """
    from ..llm.pipeline import md5_bucket_col

    docs = load_table(spark, sf_dir, "documents")
    bucket = md5_bucket_col("doc_id")
    flags = dedup_against(
        docs.filter(bucket >= 60),
        docs.filter(bucket < 60),
        threshold=0.8,
        max_df=NGRAM_MAX_DF,
    )
    # same cache hygiene as the derived checks: the operator persists its
    # two inverted indexes; materialize the small flag frame and drop them
    return _eager_summary(flags, [])


DEDUP_INCREMENTAL_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) % 100) AS bucket
  FROM documents
),
s AS (
  SELECT doc_id, bucket, text,
         CASE WHEN len(w) >= 4
              THEN list_distinct([array_to_string(list_slice(w, i, i + 3), ' ')
                                  for i in range(1, len(w) - 3 + 1)])
              ELSE [] END AS sh
  FROM t
),
newd AS (SELECT * FROM s WHERE bucket >= 60),
exd  AS (SELECT * FROM s WHERE bucket < 60),
exact AS (
  SELECT DISTINCT n.doc_id
  FROM newd n JOIN (SELECT DISTINCT text FROM exd) e ON n.text = e.text
),
nsh0 AS (SELECT doc_id, unnest(sh) AS shingle FROM newd),
esh0 AS (SELECT doc_id, unnest(sh) AS shingle FROM exd),
ndf AS (SELECT shingle, COUNT(*) AS df FROM nsh0 GROUP BY shingle),
edf AS (SELECT shingle, COUNT(*) AS df FROM esh0 GROUP BY shingle),
nsh AS (SELECT nsh0.* FROM nsh0 JOIN ndf USING (shingle) WHERE ndf.df <= {NGRAM_MAX_DF}),
esh AS (SELECT esh0.* FROM esh0 JOIN edf USING (shingle) WHERE edf.df <= {NGRAM_MAX_DF}),
nsz AS (SELECT doc_id, COUNT(*) AS n1 FROM nsh GROUP BY doc_id),
esz AS (SELECT doc_id, COUNT(*) AS n2 FROM esh GROUP BY doc_id),
co AS (
  SELECT n.doc_id AS nid, e.doc_id AS eid, COUNT(*) AS co
  FROM nsh n JOIN esh e ON n.shingle = e.shingle GROUP BY 1, 2
),
near AS (
  SELECT DISTINCT nid AS doc_id
  FROM co JOIN nsz ON co.nid = nsz.doc_id JOIN esz ON co.eid = esz.doc_id
  WHERE CAST(co AS DOUBLE) / (n1 + n2 - co) >= 0.8
)
SELECT d.doc_id,
       (ex.doc_id IS NOT NULL) AS dup_exact,
       (nr.doc_id IS NOT NULL) AS dup_near
FROM newd d
LEFT JOIN exact ex ON d.doc_id = ex.doc_id
LEFT JOIN near nr ON d.doc_id = nr.doc_id
"""


def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink→source roundtrip (``io/jsonl.py``), driver-visible.

    Writes the documents table as lang-partitioned gzipped JSONL, reads it
    back through the schema-explicit scan (no inference pass), and
    checksums text + numeric columns against the source table — certifying
    the JSON encode/decode round-trips values exactly.
    """
    import tempfile

    from ..io.jsonl import read_jsonl, write_jsonl

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    path = os.path.join(base, "d2a_jsonl_" + sf_dir.strip("/").replace("/", "_"))
    write_jsonl(docs, path, partition_by="lang", n_files=4)
    back = read_jsonl(spark, path).filter(F.col("lang") == "en")
    checksum = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(checksum).alias("text_checksum"),
        F.sum("n_chars").alias("n_chars_total"),
        F.countDistinct("source").alias("n_sources"),
    )


JSONL_ROUNDTRIP_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)) AS BIGINT) AS text_checksum,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents WHERE lang = 'en'
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (``llm/pipeline.py:
    chunk_documents``): 128-token chunks, 32-token overlap.  Map + explode
    only — full-value oracle over every chunk's text and span."""
    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_len=128, overlap=32
    )


CHUNK_DOCUMENTS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
c AS (
  SELECT doc_id, w,
         GREATEST(1, CAST(ceil((len(w) - 32) / 96.0) AS BIGINT)) AS nc
  FROM t
),
e AS (SELECT doc_id, w, unnest(range(nc)) AS chunk_id FROM c)
SELECT doc_id,
       CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * 96 AS BIGINT) AS token_start,
       CAST(len(list_slice(w, chunk_id * 96 + 1, chunk_id * 96 + 128)) AS BIGINT)
         AS chunk_tokens,
       array_to_string(list_slice(w, chunk_id * 96 + 1, chunk_id * 96 + 128), ' ')
         AS chunk_text
FROM e
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture resampling (``llm/pipeline.py: mixture_sample``,
    alpha=0.5 over ``source``).  Fixed-point weight arithmetic keeps the
    per-stratum rates bit-identical across engines, so the emitted copy set
    has a full-value oracle."""
    return mixture_sample(
        load_table(spark, sf_dir, "documents"), strata_col="source", alpha=0.5
    )


MIXTURE_SAMPLE_SQL = """
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (
  SELECT source, n, CAST(floor(sqrt(n) * 1000000) AS BIGINT) AS wt FROM c
),
t AS (SELECT SUM(wt) AS wt_sum, SUM(n) AS total FROM w),
r AS (
  SELECT source,
         CAST(floor(rate) AS BIGINT) AS whole,
         CAST(floor((rate - floor(rate)) * 1000000) AS BIGINT) AS frac_ppm
  FROM (
    SELECT source,
           CAST(total AS DOUBLE) * CAST(wt AS DOUBLE)
             / CAST(wt_sum AS DOUBLE) / CAST(n AS DOUBLE) AS rate
    FROM w, t
  )
),
d AS (
  SELECT doc_id, documents.source,
         whole + CASE
           WHEN (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
                   % 1000000) < frac_ppm
           THEN 1 ELSE 0 END AS copies
  FROM documents JOIN r ON documents.source = r.source
)
SELECT doc_id, source, CAST(unnest(range(1, copies + 1)) AS BIGINT) AS copy_id
FROM d WHERE copies > 0
"""


def q_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-50 term frequencies (``llm/text.py: top_terms``) —
    map-side-combined wordcount + TakeOrdered top-k, full-value oracle."""
    return top_terms(load_table(spark, sf_dir, "documents"), k=50)


TOP_TERMS_SQL = """
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
GROUP BY term
ORDER BY n_occurrences DESC, term ASC
LIMIT 50
"""


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-corpus spherical k-means (``llm/cluster.py``) — derived check.

    The centroids depend on float GEMMs (not portable to a SQL twin), so
    the oracle checks the data-derived invariants: every embedding got
    exactly one assignment (count oracle-recomputed), the clustering used a
    plausible number of cells, and the Lloyd objective was non-increasing
    across the distributed rounds (the algorithmic correctness signature —
    an implementation bug in assignment or the mean update breaks
    monotonicity immediately).  Pair-level behavior is pinned in
    ``tests/test_cluster.py``.
    """
    from ..llm.cluster import embedding_kmeans

    emb = load_table(spark, sf_dir, "embeddings")
    assignments, _, inertias = embedding_kmeans(emb, k=8, n_iters=3)
    eps = 1e-9 * max(abs(v) for v in inertias)
    monotone = all(b <= a + eps for a, b in zip(inertias, inertias[1:]))
    summary = assignments.agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.count(F.lit(1)) == F.countDistinct("vec_id")).alias("all_assigned"),
        F.countDistinct("cluster").between(1, 8).alias("k_used_ok"),
        F.lit(monotone).alias("inertia_monotone"),
    )
    return _eager_summary(summary, [])


EMBEDDING_KMEANS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
       TRUE AS all_assigned,
       TRUE AS k_used_ok,
       TRUE AS inertia_monotone
FROM embeddings
"""


def q_corpus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus materialization roundtrip (``io/corpus.py``), driver-visible.

    Writes the documents table hive-partitioned by ``lang`` with doc_id
    range clustering, reads it back through a partition-pruned scan
    (``lang = 'en'`` never lists the other language directories — pinned in
    tests/test_corpus_io.py), and returns count + content checksum +
    id-range anchors the oracle recomputes straight from the source table.
    A hash match certifies the write→read path loses and alters nothing.
    """
    import tempfile

    from ..io.corpus import read_corpus, write_corpus

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = "/dev/shm" if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) else tempfile.gettempdir()
    path = os.path.join(base, "d2a_corpus_" + sf_dir.strip("/").replace("/", "_"))
    write_corpus(docs, path, partition_by="lang", order_col="doc_id", n_files=4)
    back = read_corpus(spark, path).filter(F.col("lang") == "en")
    checksum = F.conv(F.substring(F.md5(F.col("text")), 1, 8), 16, 10).cast("long")
    return back.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(checksum).alias("text_checksum"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


CORPUS_ROUNDTRIP_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT)) AS BIGINT) AS text_checksum,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM documents WHERE lang = 'en'
"""


# Gate-footprint note (VERDICT r3 #5): the seven standalone text queries
# (text_stats, lang_id, doc_fingerprint, token_counts, repetition_stats,
# normalize_text, scrub_pii) and the two multimodal queries are registered as
# the merged `text_profile` / `multimodal_ops` rows so the driver's 50-entry
# window certifies every operator family each round.  The standalone
# functions, SQL twins, and pytest coverage all remain.
QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_substrings": q_dedup_substrings,
    "text_profile": q_text_profile,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "ann_cosine_topk": q_ann_cosine_topk,
    "multimodal_ops": q_multimodal_ops,
    "embedding_neardup": q_embedding_neardup,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_topk_quantized": q_ann_topk_quantized,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
    "dedup_clusters": q_dedup_clusters,
    "bm25_scores": q_bm25_scores,
    "phrase_search": q_phrase_search,
    "docs_clean_pipeline": q_docs_clean_pipeline,
    "stratified_sample": q_stratified_sample,
    "decontaminate": q_decontaminate,
    "pack_sequences": q_pack_sequences,
    "corpus_stats": q_corpus_stats,
    "corpus_roundtrip": q_corpus_roundtrip,
    "dedup_incremental": q_dedup_incremental,
    "jsonl_roundtrip": q_jsonl_roundtrip,
    "chunk_documents": q_chunk_documents,
    "mixture_sample": q_mixture_sample,
    "embedding_kmeans": q_embedding_kmeans,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_clusters_star": q_dedup_clusters_star,
    "top_terms": q_top_terms,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_substrings": DEDUP_SUBSTRINGS_SQL,
    "text_profile": TEXT_PROFILE_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    "multimodal_ops": MULTIMODAL_OPS_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    # The approximate ops register derived deterministic checks: a
    # data-derived count the oracle recomputes + quality-bound booleans the
    # oracle pins to TRUE (see the section comment above).
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "ann_lsh_topk": _ANN_CHECK_SQL,
    "ann_ivf_topk": _ANN_CHECK_SQL,
    "ann_topk_quantized": _ANN_CHECK_SQL,
    "embedding_neardup_lsh": EMBEDDING_NEARDUP_LSH_SQL,
    "dedup_clusters": DEDUP_CLUSTERS_SQL,
    "bm25_scores": BM25_SQL,
    "phrase_search": PHRASE_SQL,
    "docs_clean_pipeline": DOCS_CLEAN_SQL,
    "stratified_sample": STRATIFIED_SAMPLE_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "corpus_stats": CORPUS_STATS_SQL,
    "corpus_roundtrip": CORPUS_ROUNDTRIP_SQL,
    "dedup_incremental": DEDUP_INCREMENTAL_SQL,
    "jsonl_roundtrip": JSONL_ROUNDTRIP_SQL,
    "chunk_documents": CHUNK_DOCUMENTS_SQL,
    "mixture_sample": MIXTURE_SAMPLE_SQL,
    "embedding_kmeans": EMBEDDING_KMEANS_SQL,
    "dedup_keep_best": DEDUP_KEEP_BEST_SQL,
    "dedup_clusters_star": DEDUP_CLUSTERS_SQL,
    "top_terms": TOP_TERMS_SQL,
}
