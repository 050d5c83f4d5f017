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


#: q-gram width for the distance-2 path.  With q=2 and d=2 the count-filter
#: threshold is max(|s|,|t|) - q + 1 - d·q = max_len - 5.
_Q = 2
_D2_SLACK = _Q - 1 + 2 * _Q  # 5
#: positions within ±d of each other are banded into width-(2d+1) buckets so
#: the positional constraint becomes (almost) an equi-key, not a residual
_POS_BAND = 2 * 2 + 1  # 5


def positional_bigrams(text_col: str, len_col: str) -> F.Column:
    """``[(gram, pos), …]`` — every positional 2-gram of the string, built
    with JVM higher-order functions (no Python)."""
    return F.expr(
        f"transform(sequence(1, {len_col} - 1), "
        f"i -> struct(substring({text_col}, i, 2) AS gram, i AS pos))"
    )


def fuzzy_self_join_d2(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """All pairs with ``levenshtein <= 2``, ``id_a < id_b`` — exact, no
    cross join, via positional q-gram count filtering (Gravano et al.,
    "Approximate String Joins in a Database (Almost) for Free", VLDB
    2001).

    Two complete candidate blocks, split by pair length so each block's
    filter bound is actually a bound:

    - **q-gram block** (``max(|s|,|t|) >= 6``): strings within edit
      distance d share at least ``max(|s|,|t|) - q + 1 - d·q`` positional
      q-grams whose positions differ by at most d (the count filter; the
      join-pair count only over-approximates the multiset intersection,
      so no true pair is lost).  Grams equi-join on ``(gram,
      pos-band)`` — each probe side fans out to the 3 adjacent width-5
      bands, turning the ``|pos_a - pos_b| <= 2`` constraint into a
      bucketed key instead of a post-join residual, which caps the
      per-key fan-in at the gram's frequency *within a 5-position
      window*, not its global frequency.  A groupBy counts matches per
      pair; pairs below the ``max_len - 5`` threshold drop before any
      ``levenshtein`` runs.
    - **short block** (both ``|s| <= 5``): the threshold is <= 0 there —
      the filter admits pairs sharing zero grams ("ab" vs "cd" is
      distance 2) — so short strings pair all-to-all within a ±2 length
      band via an exploded length-key equi-join.  Driver-bounded by the
      short-string population squared over the band; on text corpora
      that population is tiny, and the band join keeps it off any
      cross-product plan.

    Both blocks end in the exact ``levenshtein <= 2`` residual, so the
    result is *identical* to the exhaustive cross join — the DuckDB
    oracle proves completeness on real data, same contract as the k=1
    path.
    """
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_txt"),
        F.length(text_col).alias("_len"),
    )

    # -- short block: both sides length <= 5, banded all-pairs ---------------
    short = base.filter(F.col("_len") <= _D2_SLACK)
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

    # -- q-gram block: max(len) >= 6 (so min(len) >= 4 within the band) ------
    grams = (
        base.filter(F.col("_len") >= 4)
        .select(
            "_id",
            "_txt",
            "_len",
            F.explode(positional_bigrams("_txt", "_len")).alias("_g"),
        )
        .select(
            "_id",
            "_txt",
            "_len",
            F.col("_g.gram").alias("_gram"),
            F.col("_g.pos").alias("_pos"),
        )
    )
    ga = grams.select(
        F.col("_gram"),
        (F.col("_pos") / _POS_BAND).cast("int").alias("_band"),
        F.col("_pos").alias("pos_a"),
        F.col("_id").alias("id_a"),
        F.col("_txt").alias("text_a"),
        F.col("_len").alias("len_a"),
    )
    gb = grams.select(
        F.col("_gram"),
        F.explode(
            F.array(
                (F.col("_pos") / _POS_BAND).cast("int") - 1,
                (F.col("_pos") / _POS_BAND).cast("int"),
                (F.col("_pos") / _POS_BAND).cast("int") + 1,
            )
        ).alias("_band"),
        F.col("_pos").alias("pos_b"),
        F.col("_id").alias("id_b"),
        F.col("_txt").alias("text_b"),
        F.col("_len").alias("len_b"),
    )
    gram_pairs = (
        ga.join(gb, ["_gram", "_band"])
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.col("pos_a") - F.col("pos_b")) <= 2)
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2)
            & (F.greatest("len_a", "len_b") >= 6)
        )
        .groupBy("id_a", "id_b", "text_a", "text_b", "len_a", "len_b")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(
            F.col("_n") >= F.greatest("len_a", "len_b") - F.lit(_D2_SLACK)
        )
        .select("id_a", "id_b", "text_a", "text_b")
    )

    cand = short_pairs.unionByName(gram_pairs)
    return cand.filter(F.levenshtein("text_a", "text_b") <= 2).withColumn(
        "dist", F.levenshtein("text_a", "text_b").cast("int")
    )
