"""Lexical relevance scoring: BM25 over the documents corpus.

The Robertson/Lucene BM25 form:

    score(D, Q) = Σ_t  idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    idf(t)      = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )

Scale design: for a FIXED query-term set (the online-search shape), the
corpus statistics (N, avgdl, per-term df) reduce to ONE tiny aggregate row
— each df is a ``sum(array_contains)`` over the same scan, so the stats
pass is a single map-side-combined aggregation, no explode, no per-term
shuffle.  The scoring pass is then map-only: every per-document quantity
(tf, |D|) is row-local, the stats row rides in via a 1-row broadcast cross
join.  Two scans total at any corpus size, both fully codegen'd.

A full search engine would materialize an inverted index instead (the
``dedup.shingle_index`` shape); this operator is the query-time scorer.
Scores round to 6 digits so JVM/libm ``ln`` ulp differences cannot leak
into cross-engine comparisons.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 6,
) -> DataFrame:
    """Per-document BM25 score for ``query_terms`` (docs with score 0 are
    dropped — they match no term).  Returns (doc_id, n_matched, score)."""
    toks = tokens_col(text_col)
    stats_aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("total_len"),
    ]
    for i, t in enumerate(query_terms):
        stats_aggs.append(
            F.sum(F.array_contains(toks, t).cast("long")).alias(f"df_{i}")
        )
    stats = docs.agg(*stats_aggs)

    scored = docs.select("doc_id", toks.alias("toks")).crossJoin(F.broadcast(stats))
    dl = F.size("toks").cast("double")
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * dl / avgdl)
    score = F.lit(0.0)
    n_matched = F.lit(0)
    for i, t in enumerate(query_terms):
        tf = F.size(F.filter("toks", lambda x: x == F.lit(t))).cast("double")
        df = F.col(f"df_{i}").cast("double")
        idf = F.log(
            (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0)
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        n_matched = n_matched + F.array_contains("toks", t).cast("int")
    return (
        scored.select(
            "doc_id",
            n_matched.alias("n_matched"),
            F.round(score, round_digits).alias("score"),
        )
        .filter(F.col("n_matched") > 0)
    )


# -- positional inverted index + phrase search --------------------------------


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(term, doc_id, pos) postings — the positional inverted index
    relation.  ``posexplode`` over the whitespace tokenization; map-only,
    fan-out = token count.  At 100 TB this relation is what you
    *materialize* (parquet bucketed by ``term``, ``io/bucketing.py``) so
    query-time term lookups are bucket-pruned scans; the on-the-fly form
    below keeps the operator self-contained."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase match via positional-postings joins: (doc_id,
    n_matches) for every document containing the consecutive token
    sequence ``phrase``, with the number of starting positions.

    Plan: the postings relation is filtered to the phrase's terms BEFORE
    any join — only those terms' postings ever shuffle (the classic
    inverted-index win: cost scales with posting-list sizes, not corpus
    size).  A k-word phrase chains k−1 equi-joins on (doc_id, pos −
    offset); keys are near-unique (a doc position holds one token) so
    the joins cannot skew.  Counting distinct start positions at the end
    gives occurrence counts without any window or sort.

    Unlike an LSH/banding candidate scheme there is no residual
    verification step — consecutive-position joins ARE the exact phrase
    semantics (they cannot over- or under-match), which the independent
    DuckDB list-position oracle confirms.
    """
    terms = phrase.split(" ")
    if not terms or any(not t for t in terms):
        raise ValueError(f"malformed phrase: {phrase!r}")
    p = positional_postings(docs, id_col=id_col, text_col=text_col)
    out = p.filter(F.col("term") == terms[0]).select("doc_id", "pos")
    for k, t in enumerate(terms[1:], start=1):
        nxt = p.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - k).alias("pos")
        )
        out = out.join(nxt, ["doc_id", "pos"])
    return out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_matches"))
