"""Fuzzy (edit-distance) self-join via deletion-neighborhood blocking.

Entity resolution — "which records are the same thing, misspelled" — is
the string twin of embedding near-dup (:mod:`..llm.similarity`).  The
naive plan is an O(n²) cross join with a ``levenshtein`` residual; this
operator uses FastSS-style *deletion neighborhoods* (Bocek et al.,
"Fast Similarity Search in Large Dictionaries", 2007): every string
expands to itself plus each single-character-deletion variant, and any two
strings within edit distance 1 provably share at least one variant —

- substitution at i: both sides delete position i → identical key;
- insertion/deletion: deleting the inserted char from the longer side
  yields the shorter side, which is its own key.

So an equi-join on the variant key is a **complete** candidate generator
for distance ≤ 1 (not just high-recall like MinHash banding), and the
``levenshtein`` residual only prunes false candidates.  The Spark result
is therefore *identical* to the exhaustive cross join — which is exactly
what the DuckDB oracle runs, proving completeness on real data.

Scale shape: explode fan-out is |s|+1 keys per row (linear), the
equi-join shuffles on near-unique variant keys (no hot key — group size
is bounded by how many strings can collapse onto one variant), candidate
pairs are distinct-ed before the residual.  Nothing is O(n²).  The
reference connector has no string-similarity surface; extension operator
per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_variants(col: str) -> F.Column:
    """``s`` plus every string obtained by deleting one character of ``s``
    — the FastSS k=1 neighborhood, built with JVM higher-order functions
    (no Python)."""
    return F.concat(
        F.array(F.col(col)),
        F.expr(
            f"transform(sequence(1, length({col})), "
            f"i -> concat(substring({col}, 1, i-1), "
            f"substring({col}, i+1, length({col}))))"
        ),
    )


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """All pairs with ``levenshtein(text_a, text_b) <= max_distance``,
    ``id_a < id_b`` — exact result, no cross join.

    ``max_distance=1`` uses the k=1 deletion neighborhood (|s|+1 variants,
    linear blocking); ``max_distance=2`` routes to q-gram count filtering
    (:func:`fuzzy_self_join_d2`) — the k=2 deletion neighborhood would
    grow quadratically in |s|, the wrong design at that radius.  Larger
    radii raise: no silent recall degradation.
    """
    if max_distance == 2:
        return fuzzy_self_join_d2(df, id_col, text_col)
    if max_distance != 1:
        raise ValueError("fuzzy_self_join supports max_distance in {1, 2}")
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.explode(deletion_variants(text_col)).alias("_key"),
    ).distinct()  # a string with repeated chars yields duplicate variants
    a = keyed.select(
        F.col("_key"),
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("text_a"),
    )
    b = keyed.select(
        F.col("_key"),
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("text_b"),
    )
    cand = (
        a.join(b, "_key")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )
    return cand.filter(
        F.levenshtein("text_a", "text_b") <= max_distance
    ).withColumn("dist", F.levenshtein("text_a", "text_b").cast("int"))


#: strings this short make pair-filter thresholds vacuous (a distance-2 pair
#: can share NOTHING: "ab" vs "cd"), so they pair via the length-band block
_D2_SHORT = 5


def _segment_bounds(i: F.Column, ls: F.Column) -> tuple[F.Column, F.Column]:
    """(start, length) of segment ``i`` (1-based, of 3) in the even
    partition of a string of length ``ls``: the first ``3 - ls%3``
    segments get ``ls div 3`` chars, the rest one more.  Pure column
    arithmetic — evaluated identically on the index and probe sides,
    which is what makes the segment keys join-able."""
    b = (ls / 3).cast("int")
    rem = ls - b * 3
    length = F.when(i > 3 - rem, b + 1).otherwise(b)
    start = 1 + (i - 1) * b + F.greatest(F.lit(0), (i - 1) - (3 - rem))
    return start, length


def fuzzy_self_join_d2(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """All pairs with ``levenshtein <= 2``, ``id_a < id_b`` — exact, no
    cross join, via segment-pigeonhole blocking (Pass-Join: Li, Deng,
    Wang, Feng, "Can we beat the prefix filtering?", VLDB 2011).

    **Why not q-gram count filtering** (the textbook alternative): its
    candidate join keys are 2-grams, and on low-entropy text (shared
    vocabulary, common prefixes — exactly what entity names and template
    documents look like) hot grams appear in a constant fraction of all
    strings, making the gram join quadratic before the count threshold
    ever runs (measured: >2 min on 7.7k 30-char vocabulary strings where
    this implementation takes seconds).  Segment keys are ~|s|/3 chars
    long — selective enough that candidates are plausible near-duplicates
    only.

    The pigeonhole: split every indexed string into 3 contiguous
    segments; 2 edits can corrupt at most 2 of them, so any string within
    distance 2 contains at least one segment VERBATIM, starting within ±2
    of its home position.  Complete candidate generation is therefore an
    equi-join: the index side emits its 3 ``(segment, i, len)`` keys
    (linear); the probe side emits, for each candidate index length
    ``ls ∈ [len−2, len+2]``, each segment slot, and each shift ``δ ∈
    [−2, 2]``, the substring the lemma says must match (≤ 75 keys per
    string, linear).  Candidates dedup before the exact ``levenshtein <=
    2`` residual.

    Pairs where both strings are ≤ 5 chars pair all-to-all within a ±2
    length band instead (segments degenerate below ~2 chars); the blocks
    are disjoint (max-length ≥ 6 vs ≤ 5) and together complete, so the
    result is *identical* to the exhaustive cross join — which the DuckDB
    oracle verifies on real data, same contract as the k=1 path.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    )

    # -- short block: both sides length <= 5, banded all-pairs ---------------
    short = base.filter(F.col("_len") <= _D2_SHORT)
    sa = short.select(
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("text_a"),
        F.explode(F.expr("sequence(_len, _len + 2)")).alias("_lk"),
    )
    sb = short.select(
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("text_b"),
        F.col("_len").alias("_lk"),
    )
    # the a-side explodes to lengths [len, len+2], so every unordered pair
    # with |len diff| <= 2 matches at least once with len_a <= len_b;
    # canonicalize to id_a < id_b and distinct (equal lengths match twice)
    short_pairs = (
        sa.join(sb, "_lk")
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a2"),
            F.greatest("id_a", "id_b").alias("id_b2"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("text_a"))
            .otherwise(F.col("text_b"))
            .alias("text_a2"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("text_b"))
            .otherwise(F.col("text_a"))
            .alias("text_b2"),
        )
        .toDF("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )

    # -- segment block: pairs with max(len) >= 6 (so min(len) >= 4) ----------
    eligible = base.filter(F.col("_len") >= 4)
    i_col = F.explode(F.expr("sequence(1, 3)")).alias("_i")
    idx = eligible.select(
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("text_a"),
        F.col("_len").alias("len_a"),
        i_col,
    )
    st, ln = _segment_bounds(F.col("_i"), F.col("len_a"))
    idx = idx.withColumn("_ls", F.col("len_a")).withColumn(
        "_seg", F.col("text_a").substr(st, ln)
    )

    probe = (
        eligible.select(
            F.col("_id").alias("id_b"),
            F.col("_txt").alias("text_b"),
            F.col("_len").alias("len_b"),
        )
        .select(
            "*",
            F.explode(
                F.expr("sequence(greatest(len_b - 2, 4), len_b + 2)")
            ).alias("_ls"),
        )
        .select("*", F.explode(F.expr("sequence(1, 3)")).alias("_i"))
        .select("*", F.explode(F.expr("sequence(-2, 2)")).alias("_delta"))
    )
    pst, pln = _segment_bounds(F.col("_i"), F.col("_ls"))
    probe = (
        probe.withColumn("_start", pst + F.col("_delta"))
        .withColumn("_slen", pln)
        .filter(
            (F.col("_start") >= 1)
            & (F.col("_start") + F.col("_slen") - 1 <= F.col("len_b"))
        )
        .withColumn("_seg", F.col("text_b").substr(F.col("_start"), F.col("_slen")))
        .select("id_b", "text_b", "len_b", "_ls", "_i", "_seg")
    )

    seg_pairs = (
        idx.join(probe, ["_seg", "_i", "_ls"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2)
            & (F.greatest("len_a", "len_b") >= 6)
        )
        .select("id_a", "id_b", "text_a", "text_b")
        .distinct()
    )

    cand = short_pairs.unionByName(seg_pairs)
    return cand.filter(F.levenshtein("text_a", "text_b") <= 2).withColumn(
        "dist", F.levenshtein("text_a", "text_b").cast("int")
    )
