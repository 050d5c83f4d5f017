"""Text-analysis operators over a document corpus.

Design rule: everything here is built from ``pyspark.sql.functions`` array /
string expressions — whole-stage codegen, no Python in the hot path.  At
100 TB these run as map-only passes over the corpus (no shuffle), so they
scale with input splits.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

# Marker stopwords per language for the n-gram/stopword language-ID heuristic.
# Tie-break priority is the dict order (en > de > fr > es).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
    "es": ["el", "los", "las", "y"],
}

STOPWORDS = ["the", "a", "and", "of"]


def tokens_col(text: Column | str = "text") -> Column:
    """Whitespace tokenization (the corpus is single-space normalized)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def _marker_count(toks: Column, markers: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(markers)))


def quality_col(text_col: str = "text") -> Column:
    """The deterministic quality score as a bare column (row-local).

    Exposed separately so composed pipelines (llm/pipeline.py) can stack
    quality + language-ID + token counts in ONE projection instead of
    joining the per-operator DataFrames on doc_id — identical values, zero
    shuffles.
    """
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    stop_ratio = _marker_count(toks, STOPWORDS).cast("double") / n_tokens
    return (
        F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0)) * F.lit(0.5)
        + (F.lit(1.0) - stop_ratio) * F.lit(0.5)
    )


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics + a deterministic quality score.

    Quality heuristic (same spirit as C4/Gopher filters): penalize very short
    docs and very high stopword ratios; all arithmetic is fixed-order double
    ops so any engine computes identical values.
    """
    toks = tokens_col(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(text_col)
    n_stop = _marker_count(toks, STOPWORDS)
    avg_word_len = (n_chars - (n_tokens - F.lit(1))).cast("double") / n_tokens
    stop_ratio = n_stop.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        n_stop.alias("n_stopwords"),
        avg_word_len.alias("avg_word_len"),
        stop_ratio.alias("stop_ratio"),
        quality_col(text_col).alias("quality"),
    )


def pred_lang_col(text_col: str = "text") -> Column:
    """Predicted language as a bare column (see :func:`quality_col`)."""
    toks = tokens_col(text_col)
    scores = {lang: _marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    return (
        F.when((en >= de) & (en >= fr) & (en >= es) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de >= es) & (de > 0), F.lit("de"))
        .when((fr >= es) & (fr > 0), F.lit("fr"))
        .when(es > 0, F.lit("es"))
        .otherwise(F.lit("unknown"))
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language identification.

    Scores each language by marker-token hits; argmax with fixed priority
    order, ``unknown`` when no marker fires.  (The driver corpus is
    monolingual-vocab, so on it this mostly exercises the 'en'/'unknown'
    paths; multilingual behavior is pinned by unit tests.)
    """
    toks = tokens_col(text_col)
    scores = {lang: _marker_count(toks, m) for lang, m in LANG_MARKERS.items()}
    en, de, fr, es = scores["en"], scores["de"], scores["fr"], scores["es"]
    pred = pred_lang_col(text_col)
    return docs.select(
        "doc_id",
        en.alias("score_en"),
        de.alias("score_de"),
        fr.alias("score_fr"),
        es.alias("score_es"),
        pred.alias("pred_lang"),
    )


def ngrams_col(text_col: str = "text", n: int = 4) -> Column:
    """Word n-grams (with repeats, in order) as an array<string> column.

    ``sequence(1, size-n+1)`` + ``slice`` keeps n-gramming inside codegen;
    documents shorter than ``n`` tokens yield an empty array.
    """
    toks = tokens_col(text_col)
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    # guard: sequence(1, x<1) DESCENDS in Spark, so short docs need an
    # explicit empty-array branch instead of a greatest() clamp
    return F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))


def shingles_col(text_col: str = "text", n: int = 4) -> Column:
    """Distinct word n-gram shingles (set semantics, for Jaccard/MinHash)."""
    return F.array_distinct(ngrams_col(text_col, n))


def _max_run_count(arr: Column) -> Column:
    """Count of the most frequent element of an array — row-local.

    Sort, then one ``aggregate`` pass tracking the current equal-run length
    and the best run seen.  Stays inside whole-stage codegen: the per-doc
    mode count never needs an explode + groupBy (which would shuffle one
    row per n-gram occurrence — at 100 TB that is the corpus re-keyed by
    n-gram for a value each row can compute locally).
    """
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def merge(acc: Column, x: Column) -> Column:
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    return F.aggregate(F.array_sort(arr), init, merge, lambda acc: acc["best"])


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    max_bigram_cap: float = 0.2,
    dup_trigram_cap: float = 0.3,
) -> DataFrame:
    """Gopher-style repetition filters: top-bigram and duplicate-trigram load.

    The two classic repetition signals from the Gopher data pipeline (Rae
    et al. 2021, table A1), in token form:

    - ``max_bigram_frac`` — occurrences of the single most frequent word
      2-gram over all 2-gram occurrences (Gopher's "fraction in the most
      common n-gram" family);
    - ``dup_trigram_frac`` — fraction of 3-gram occurrences that are
      repeats of an earlier one (Gopher's "fraction in duplicate n-grams").

    ``gopher_keep`` applies the caps.  Everything is a row-local array
    expression (see :func:`_max_run_count`) — a map-only pass at any scale.
    Exact integer counts + one double division keep it engine-portable.
    """
    from .util import spread

    base = spread(docs).select(
        "doc_id",
        ngrams_col(text_col, 2).alias("bg"),
        ngrams_col(text_col, 3).alias("tg"),
    )
    counted = base.select(
        "doc_id",
        F.size("bg").alias("n_bigrams"),
        _max_run_count(F.col("bg")).alias("max_bigram_count"),
        F.size("tg").alias("n_tg"),
        F.size(F.array_distinct("tg")).alias("n_tg_distinct"),
    )
    max_frac = F.when(
        F.col("n_bigrams") > 0,
        F.col("max_bigram_count").cast("double") / F.col("n_bigrams"),
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("n_tg") > 0,
        (F.col("n_tg") - F.col("n_tg_distinct")).cast("double") / F.col("n_tg"),
    ).otherwise(F.lit(0.0))
    return counted.select(
        "doc_id",
        "n_bigrams",
        "max_bigram_count",
        max_frac.alias("max_bigram_frac"),
        dup_frac.alias("dup_trigram_frac"),
        (
            (max_frac <= F.lit(max_bigram_cap)) & (dup_frac <= F.lit(dup_trigram_cap))
        ).alias("gopher_keep"),
    )


# Engine-portable regexes (Java regex on Spark, RE2 on DuckDB — the subset
# below behaves identically on both; no lookarounds, no backrefs).
CONTROL_CHARS_RE = r"[\x00-\x1f\x7f]"
WHITESPACE_RUN_RE = r"\s+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
LONG_NUM_RE = r"\b\d{7,}\b"


def normalize_text(docs: DataFrame, text_col: str = "text", nfc: bool = False) -> DataFrame:
    """Canonical text cleanup: control-strip → (NFC) → lowercase → collapse
    whitespace → trim.

    The default path is pure codegen'd string expressions — map-only at any
    scale.  ``nfc=True`` adds Unicode NFC normalization, which Spark has no
    built-in for, so it rides an Arrow-batched ``pandas_udf`` over
    ``unicodedata`` — the sanctioned slow path, off by default because most
    corpora arrive NFC already.
    """
    c: Column = F.regexp_replace(F.col(text_col), CONTROL_CHARS_RE, " ")
    if nfc:
        @pandas_udf(T.StringType())
        def _nfc(s: pd.Series) -> pd.Series:
            import unicodedata

            return s.map(lambda x: unicodedata.normalize("NFC", x) if x is not None else None)

        c = _nfc(c)
    c = F.trim(F.regexp_replace(F.lower(c), WHITESPACE_RUN_RE, " "))
    return docs.select(
        "doc_id",
        c.alias("norm_text"),
        F.length(c).alias("n_chars_norm"),
        (c != F.col(text_col)).alias("changed"),
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails, IPv4 addresses, and long digit runs; count each.

    The standard pre-training scrub pass (emails → ``<EMAIL>``, IPs →
    ``<IP>``, 7+-digit runs → ``<NUM>``), ordered so earlier replacements
    can't create later matches (replacement tokens contain no digits).
    Counts come from ``regexp_extract_all`` on the original text.  All
    regexes are the Java/RE2-portable subset, so the DuckDB oracle runs the
    byte-identical patterns.  Map-only, codegen'd.
    """
    c = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
        ),
        LONG_NUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        scrubbed.alias("clean_text"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), 0)).alias("n_ips"),
        F.size(F.regexp_extract_all(c, F.lit(LONG_NUM_RE), 0)).alias("n_long_nums"),
    )


# BPE-ish pre-tokenizer: letter runs / digit runs / single non-alnum marks —
# the GPT-2-style split that precedes byte-pair merging.  Engine-portable
# subset of regex (no lookarounds) so the DuckDB oracle runs the same pattern.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens_col(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), 0)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace words and BPE-ish regex pieces.

    ``n_tokens_bpe`` approximates the pre-merge piece count a BPE tokenizer
    sees; ``distinct_ratio`` (type/token ratio) is the standard repetition
    signal for corpus filtering.  Map-only, codegen'd — scales with splits.
    """
    ws = tokens_col(text_col)
    bpe = bpe_tokens_col(text_col)
    return docs.select(
        "doc_id",
        F.size(ws).alias("n_tokens_ws"),
        F.size(bpe).alias("n_tokens_bpe"),
        F.size(F.array_distinct(bpe)).alias("n_distinct_bpe"),
        (F.size(F.array_distinct(bpe)).cast("double") / F.size(bpe)).alias(
            "distinct_ratio"
        ),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """Document fingerprints: full-text md5 + minimum shingle-hash.

    The min-shingle-hash is the 1-hash special case of MinHash — two docs
    sharing their rarest shingle collide — and is the deterministic,
    oracle-checkable core of the rolling-hash fingerprint family.
    (Per-doc work here is ~n_shingles md5 calls — heavy enough that the
    single-split bench scan is worth fanning out; see ``util.spread``.)
    """
    from .util import spread

    docs = spread(docs)
    sh = shingles_col(text_col, n)
    return docs.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("text_md5"),
        F.array_min(F.transform(sh, F.md5)).alias("min_shingle_md5"),
        F.size(sh).alias("n_shingles"),
    )


def top_terms(docs: DataFrame, k: int = 50, text_col: str = "text") -> DataFrame:
    """Corpus-level term frequencies, top ``k`` — the vocabulary-building /
    stopword-discovery primitive (and the classic wordcount shape).

    Output: (term, n_occurrences, n_docs) ordered by frequency, ties broken
    by term so the cut is deterministic.

    Scale shape: explode → groupBy(term) benefits fully from map-side
    partial aggregation (each task emits one partial row per *distinct*
    term it saw, not per occurrence), so the exchange carries vocabulary,
    not corpus.  The top-k is `TakeOrderedAndProject` — per-partition heaps
    merged on the driver, never a full sort of the vocabulary.
    """
    toks = tokens_col(text_col)
    exploded = docs.select(
        "doc_id", F.explode(toks).alias("term")
    )
    return (
        exploded.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n_occurrences"), F.asc("term"))
        .limit(k)
    )
