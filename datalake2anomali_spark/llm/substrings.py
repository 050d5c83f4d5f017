"""Exact substring deduplication — corpus-level repeated-span detection.

The training-data operator from Lee et al., *"Deduplicating Training Data
Makes Language Models Better"* (ACL 2022): exact duplicate SPANS (k-token
windows occurring more than once anywhere in the corpus) are found and
merged into maximal removable intervals per document.  Document-level dedup
(:mod:`.dedup`) misses these — boilerplate headers, license blocks, and
quoted passages repeat across otherwise-unique documents.

Spark-first design (the paper uses a suffix array, which is a single-node
construction; the distributed restatement is a window join):

1. every k-token window → ``(doc_id, pos, md5(window))`` via one
   codegen'd ``posexplode`` — map-only fan-out, ~n_tokens rows per doc;
2. window counts: one ``groupBy(hash)`` with full map-side partial
   aggregation — the exchange carries the *window vocabulary*, not the
   corpus;
3. duplicated positions join back by hash (only windows with
   ``count ≥ min_repeats`` survive the build side);
4. positions → maximal spans per doc with one gaps-and-islands pass
   (shuffle only the duplicated positions — in a real corpus a small
   fraction of total tokens).

At 100 TB the dominant cost is step 2's vocabulary exchange; the md5 keys
are fixed 32-byte digests regardless of k, and skew is impossible by
construction (a hash groupBy over near-unique keys).  No stage ever holds a
whole document's windows in one task except the row-local explode.

The reference has no substring operator (682-LoC REST connector); this
belongs to the training-data extension surface the driver mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import ngrams_col, tokens_col


def duplicate_windows(
    docs: DataFrame,
    k: int = 16,
    min_repeats: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, wh) for every k-token window repeated ≥ ``min_repeats``
    times corpus-wide (positions 0-based, occurrences counted globally, so
    a within-document repeat also qualifies)."""
    wins = docs.select(
        "doc_id", F.posexplode(ngrams_col(text_col, k)).alias("pos", "w")
    ).select("doc_id", "pos", F.md5("w").alias("wh"))
    dup_hashes = (
        wins.groupBy("wh")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= min_repeats)
        .select("wh")
    )
    return wins.join(dup_hashes, "wh").select("doc_id", "pos", "wh")


def dedup_substrings(
    docs: DataFrame,
    k: int = 16,
    min_repeats: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Per-document repeated-span summary under exact substring dedup.

    Output, one row per input document (zero-filled when nothing repeats):

    - ``n_tokens`` — document length;
    - ``n_dup_windows`` — duplicated k-windows starting in this doc;
    - ``n_spans`` — maximal removable intervals after merging overlapping /
      adjacent windows (two windows at p < q chain iff ``q ≤ p + k``);
    - ``n_tokens_removed`` — tokens covered by those intervals (what the
      Lee-et-al. pass would cut);
    - ``removed_ratio`` — fraction of the document that is repeated text.

    The span merge is one gaps-and-islands window pass over the duplicated
    positions only: ``new_span = pos − lag(pos) > k``, then span extents by
    (doc, span) and totals by doc.  With equal-length windows the chain's
    coverage is exactly ``max(pos)+k − min(pos)`` per span, so the interval
    union needs no explicit interval structs.
    """
    dup = duplicate_windows(docs, k, min_repeats, text_col)
    w_doc = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        dup.withColumn("_prev", F.lag("pos").over(w_doc))
        .withColumn(
            "_new",
            (F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > k)).cast("int"),
        )
        .withColumn("_span", F.sum("_new").over(w_doc))
        .groupBy("doc_id", "_span")
        .agg(
            F.count(F.lit(1)).alias("n_win"),
            (F.max("pos") + F.lit(k) - F.min("pos")).alias("covered"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("n_win").alias("n_dup_windows"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("covered").alias("n_tokens_removed"),
        )
    )
    base = docs.select("doc_id", F.size(tokens_col(text_col)).alias("n_tokens"))
    return base.join(spans, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
        F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        F.coalesce("n_tokens_removed", F.lit(0)).alias("n_tokens_removed"),
        (
            F.coalesce("n_tokens_removed", F.lit(0)).cast("double") / F.col("n_tokens")
        ).alias("removed_ratio"),
    )
