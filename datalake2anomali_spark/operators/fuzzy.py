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

    Only ``max_distance=1`` is supported: the k=1 deletion neighborhood
    (|s|+1 variants) is the sweet spot where blocking stays linear; k=2
    blocking grows the neighborhood quadratically in |s| and belongs to a
    different design (q-gram count filtering).  Raising instead of
    silently degrading recall keeps the operator's completeness contract
    honest.
    """
    if max_distance != 1:
        raise ValueError("fuzzy_self_join supports max_distance=1 only")
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
