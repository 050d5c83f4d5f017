"""Oracle-checked LLM-pipeline queries (dedup / similarity / text /
multimodal) over the driver's ``documents`` and ``embeddings`` tables.

Approximate operators (MinHash-LSH, SimHash, hyperplane ANN) have no DuckDB
twin — their hash functions aren't portable — so they run as rows-only
checks here and are pinned against their exact counterparts in
``tests/test_llm.py`` (recall bounds), which is the honest way to test an
approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.tables import load_table
from ..llm.dedup import (
    dedup_exact,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from ..llm.multimodal import extract_features, sample_frames, with_binary_payload
from ..llm.similarity import (
    ann_hyperplane_topk,
    ann_ivf_topk,
    cosine_topk,
    embedding_neardup_exact,
    embedding_neardup_lsh,
)
from ..llm.text import fingerprint, lang_id, text_stats, token_counts

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


# -- approximate operators: rows-only for the driver; recall-tested in pytest -


def q_embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # low threshold needs shorter codes + more tables for recall: collision
    # probability per table is (1 - theta/pi)^bits, tiny at theta ~ 66 deg
    # unless bits is small.
    return embedding_neardup_lsh(
        load_table(spark, sf_dir, "embeddings"),
        threshold=0.4,
        n_tables=16,
        bits_per_table=4,
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_dedup_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_near_pairs(load_table(spark, sf_dir, "documents"), max_distance=3)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_hyperplane_topk(
        emb, _query_vectors(spark, sf_dir), k=5, n_tables=8, bits_per_table=4
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, _query_vectors(spark, sf_dir), k=5, n_cells=16, nprobe=6)


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "ann_cosine_topk": q_ann_cosine_topk,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "token_counts": q_token_counts,
    "embedding_neardup": q_embedding_neardup,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "embedding_neardup_lsh": q_embedding_neardup_lsh,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "text_stats": TEXT_STATS_SQL,
    "lang_id": LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "ann_cosine_topk": ANN_COSINE_SQL,
    "multimodal_features": MULTIMODAL_SQL,
    "multimodal_frames": MULTIMODAL_FRAMES_SQL,
    "token_counts": TOKEN_COUNTS_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    # dedup_minhash_lsh / dedup_simhash / ann_lsh_topk / ann_ivf_topk /
    # embedding_neardup_lsh: rows-only by design (non-portable hash functions /
    # trained quantizer); recall vs the exact baseline is pinned in tests
}
