"""Deterministic negative sampling for contrastive training pairs.

Contrastive objectives (InfoNCE, triplet, DPR-style retrieval training)
need k negatives per anchor drawn from a corpus, EXCLUDING the anchor
itself and its known positives.  The naive formulation — rank a random
key over the anchor × corpus cross product — is O(|A|·|C|) and dead at
100 TB.  The scalable shape used here:

1. **Dense corpus index once.**  Each candidate gets a stable 0-based
   index via :func:`..operators.ranking.global_row_numbers` (range
   partition + per-partition offsets — never a one-task global sort).
2. **Hash draws, not random draws.**  Anchor ``a``'s draw ``j`` targets
   index ``md5(a ":" j) mod N`` — a pure per-row expression, so the
   (anchor, draw) relation is |A|·k' rows built by ``explode(sequence)``
   with no shuffle, and the only join is an equi-join of those draws
   against the indexed corpus (hash join on ``idx``).  md5 is
   bit-identical across Spark, DuckDB, and retried tasks (the
   ``md5_bucket_col`` argument), so the sample is reproducible across
   engines and retries — the property a training pipeline needs for
   exact resume.
3. **Oversample, filter, keep first k.**  Draws that hit the anchor
   itself, a known positive, or a duplicate candidate are dropped, and
   the surviving draws keep their draw order; ``oversample`` bounds the
   extra draws (k' = k·oversample).  With positives ≪ corpus the miss
   probability per draw is ~(1 + |pos|)/N, so small constant
   oversampling suffices; under-filled anchors are a visible column
   (``n_drawn``), never silently padded.

Driver-side state: one corpus count (1 row) + the ranking operator's
per-partition offset map.  Everything else is expressions and one
equi-join.

Reference parity: none — training-data pipeline extension per the build
brief (sampling family, alongside A-ES weighted sampling and mixture
sampling in ``pipeline.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..operators.ranking import global_row_numbers


def corpus_index(corpus: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, idx): a dense stable 0-based index over the candidate pool,
    ordered by ``id_col`` (which must be unique) — computed without a
    single-partition window."""
    return global_row_numbers(corpus.select(id_col), [id_col]).select(
        F.col(id_col), (F.col("rn") - 1).alias("idx")
    )


def _draw_idx(anchor_col: str, n: int):
    """Index of draw ``j`` for the anchor: first 15 md5 hex chars of
    ``"{anchor}:{j}"`` as a long, mod corpus size — the engine-portable
    pseudo-random (see module doc)."""
    key = F.concat(F.col(anchor_col).cast("string"), F.lit(":"), F.col("_j"))
    return F.pmod(
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long"), F.lit(n)
    )


def negative_samples(
    anchors: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "doc_id",
    anchor_col: str | None = None,
    positives: DataFrame | None = None,
    oversample: int = 3,
) -> DataFrame:
    """k deterministic negatives per anchor from ``corpus``.

    ``anchors`` carries ``anchor_col`` (default ``id_col``); ``corpus``
    carries ``id_col`` (unique).  ``positives``, if given, is a 2-column
    frame read POSITIONALLY as (anchor id, positive candidate id) pairs
    to exclude alongside the anchor itself (positional because anchor
    and candidate ids usually share one column name).

    Returns (anchor_col, neg_id, draw, n_drawn): up to ``k`` rows per
    anchor ordered by draw number, with ``n_drawn`` the per-anchor count
    actually achieved.  EVERY anchor appears: one whose draws were all
    filtered out (corpus ≈ self + positives) yields a single
    (anchor, NULL, NULL, n_drawn=0) row, so a shortfall is always
    joinable/filterable — callers decide whether it is an error.
    """
    if k < 1 or oversample < 1:
        raise ValueError("k and oversample must be >= 1")
    anchor_col = anchor_col or id_col
    n = corpus.select(id_col).count()
    if n == 0:
        raise ValueError("corpus is empty")

    idx = corpus_index(corpus, id_col)
    # internal anchor alias: anchor and candidate ids usually share a name
    draws = (
        anchors.select(F.col(anchor_col).alias("_anchor"))
        .distinct()
        .withColumn(
            "_j", F.explode(F.sequence(F.lit(0), F.lit(k * oversample - 1)))
        )
        .withColumn("_idx", _draw_idx("_anchor", n))
    )
    cand = (
        draws.join(idx.withColumnRenamed("idx", "_idx"), "_idx")
        .filter(F.col(id_col) != F.col("_anchor"))
        .select(
            F.col("_anchor").alias(anchor_col),
            F.col(id_col).alias("neg_id"),
            F.col("_j"),
        )
    )
    if positives is not None:
        if len(positives.columns) != 2:
            raise ValueError(
                "positives must have exactly 2 columns (anchor id, "
                f"positive id); got {positives.columns}"
            )
        pos = positives.toDF(anchor_col, "neg_id").distinct()
        cand = cand.join(pos, [anchor_col, "neg_id"], "left_anti")

    # dedupe repeated candidates per anchor keeping the earliest draw,
    # then keep the first k surviving draws in draw order — two windows
    # over the same (anchor) partitioning, one exchange
    w_dup = Window.partitionBy(anchor_col, "neg_id").orderBy("_j")
    w_rank = Window.partitionBy(anchor_col).orderBy("_j")
    filled = (
        cand.withColumn("_dup", F.row_number().over(w_dup))
        .filter(F.col("_dup") == 1)
        .withColumn("draw", F.row_number().over(w_rank))
        .filter(F.col("draw") <= k)
        .select(anchor_col, "neg_id", "draw")
    )
    # left join back from the full anchor set: an anchor whose every draw
    # was filtered out (self/positive/duplicate) must still appear, as
    # one (anchor, NULL, NULL, n_drawn=0) row — the visibility contract
    out = (
        anchors.select(anchor_col)
        .distinct()
        .join(filled, anchor_col, "left")
        .withColumn(
            "n_drawn",
            F.count("neg_id").over(Window.partitionBy(anchor_col)),
        )
    )
    return out


def negative_samples_sql(
    k: int,
    corpus_filter: str = "TRUE",
    anchor_filter: str = "TRUE",
    oversample: int = 3,
) -> str:
    """DuckDB twin of :func:`negative_samples` over the ``documents``
    table with self-exclusion (no positives) — the oracle's replay of the
    same md5 draws, dense index, dedupe, and first-k selection."""
    return f"""
WITH corpus AS (
  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS idx
  FROM documents WHERE {corpus_filter}
), anchors AS (
  SELECT DISTINCT doc_id AS anchor_id FROM documents WHERE {anchor_filter}
), draws AS (
  SELECT a.anchor_id, j AS _j,
         CAST(('0x' || substr(md5(CAST(a.anchor_id AS VARCHAR) || ':' ||
               CAST(j AS VARCHAR)), 1, 15)) AS UBIGINT)
           % (SELECT COUNT(*) FROM corpus) AS _idx
  FROM anchors a, UNNEST(range({k * oversample})) AS t(j)
), cand AS (
  SELECT d.anchor_id, c.doc_id AS neg_id, d._j
  FROM draws d JOIN corpus c ON c.idx = d._idx
  WHERE c.doc_id <> d.anchor_id
), dedup AS (
  SELECT anchor_id, neg_id, _j,
         ROW_NUMBER() OVER (PARTITION BY anchor_id, neg_id ORDER BY _j) AS _dup
  FROM cand
), ranked AS (
  SELECT anchor_id, neg_id, _j,
         ROW_NUMBER() OVER (PARTITION BY anchor_id ORDER BY _j) AS draw
  FROM dedup WHERE _dup = 1
), final AS (
  SELECT anchor_id, neg_id, draw FROM ranked WHERE draw <= {k}
)
SELECT a.anchor_id, f.neg_id, f.draw,
       COUNT(f.neg_id) OVER (PARTITION BY a.anchor_id) AS n_drawn
FROM anchors a LEFT JOIN final f ON f.anchor_id = a.anchor_id
"""
