"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these formulations):

- **exact**: hash-groupBy on the text digest — one shuffle on a 32-char key,
  never on the text itself.
- **ngram Jaccard**: inverted shingle index (explode → self-equi-join on the
  shingle → pair-count) — the join key is the shingle, so the shuffle
  distributes by shingle and hot shingles are the skew risk; a document-
  frequency cap (``max_df``) drops ubiquitous shingles, which is both the
  standard IR trick and the skew guard at 100 TB.
- **MinHash+LSH**: signatures via ``xxhash64(shingle, seed)`` min-aggregated
  per doc — k independent permutations approximated by k seeds; banding
  turns candidate generation into an equi-join on (band, band-hash).  Only
  candidate pairs get exact verification. This is the linear-ish scale path:
  no O(n²) anywhere.
- **SimHash**: 64-bit signature from token-hash bit votes; Hamming-ball
  search via 4-segment blocking (pigeonhole: distance ≤3 ⇒ one of 4
  16-bit segments equal) — again an equi-join, no cross product.

All hashing is ``xxhash64`` (JVM, deterministic, seedable) so results are
reproducible across runs/partitionings; LSH-family ops are verified against
the exact-Jaccard oracle in tests rather than DuckDB (no matching hash
function there — the driver records them as rows-only checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles_col


def dedup_exact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: keep the smallest doc_id per identical text.

    Grouping key is ``md5(text)`` so the shuffle moves 32-byte digests, not
    documents; survivors join back by doc_id if full rows are needed.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


def shingle_index(docs: DataFrame, text_col: str = "text", n: int = 4, max_df: int | None = None) -> DataFrame:
    """Inverted index: (shingle, doc_id) with per-doc shingle counts."""
    sh = docs.select(
        "doc_id",
        F.explode(shingles_col(text_col, n)).alias("shingle"),
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle")
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 4,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold (exact).

    co-occurrence counts come from the inverted index self-join (candidates
    only — pairs sharing no shingle never materialize); set sizes join in
    from a tiny per-doc aggregate.  Jaccard = co/(n1+n2-co) is exact integer
    arithmetic + one double division, so it is engine-independent.
    """
    idx = shingle_index(docs, text_col, n, max_df)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = idx.alias("a")
    b = idx.alias("b")
    co = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("co"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"))
    jac = F.col("co").cast("double") / (F.col("n1") + F.col("n2") - F.col("co"))
    return (
        co.join(s1, "d1")
        .join(s2, "d2")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n: int = 4, k: int = 64
) -> DataFrame:
    """k-permutation MinHash signature per document.

    One explode of the shingle set, then k min-aggregates of
    ``xxhash64(shingle, seed)`` computed in a single groupBy pass (k columns,
    one shuffle).  Signature is an array<long> column.
    """
    sh = docs.select("doc_id", F.explode(shingles_col(text_col, n)).alias("shingle"))
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}") for i in range(k)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[F.col(f"h{i}") for i in range(k)]).alias("signature"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band become candidates.

    Band hash = xxhash64 over the band's signature slice; candidates are the
    equi-join on (band, band_hash) with d1 < d2 (dedup'd across bands).
    """
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bh"),
            )
            for b in range(bands)
        ]
    )
    banded = signatures.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 4,
    k: int = 64,
    bands: int = 16,
    threshold: float = 0.8,
) -> DataFrame:
    """MinHash-LSH near-dup detection with exact verification.

    Candidates from banding, then exact Jaccard on just those pairs (join
    back to shingle sets) — the classic verify step that removes LSH false
    positives, leaving only false negatives (tunable via k/bands).
    """
    sigs = minhash_signatures(docs, text_col, n, k)
    cands = minhash_lsh_candidates(sigs, bands, k // bands)
    sh = docs.select("doc_id", shingles_col(text_col, n).alias("sh"))
    s1 = sh.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    s2 = sh.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    verified = (
        cands.join(s1, "d1")
        .join(s2, "d2")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh1", "sh2")).cast("double")
            / F.size(F.array_union("sh1", "sh2")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("d1", "d2", "jaccard")


def simhash_signatures(docs: DataFrame, text_col: str = "text", n: int = 4) -> DataFrame:
    """64-bit SimHash per document from shingle-hash bit votes.

    Features are word n-gram shingles (tokens alone are far too weakly
    discriminating on small-vocabulary corpora — every doc shares most of
    the token set).  For each bit position: +1 if the shingle's xxhash64 has
    the bit set, -1 otherwise; the signature bit is the vote sign.
    Expressed as 64 codegen'd aggregate expressions over the exploded
    shingle stream — one shuffle, no UDF.
    """
    toks = docs.select("doc_id", F.explode(shingles_col(text_col, n)).alias("tok"))
    h = F.xxhash64(F.col("tok"))
    # test bit i via unsigned shift (a 1<<63 literal overflows signed long)
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(64)
    ]
    voted = toks.groupBy("doc_id").agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        for i in range(63)
    ]
    # bit 63 would overflow a signed long via 1<<63; fold it as the sign bit
    sig = sum(bit_terms[1:], start=bit_terms[0])
    sig = F.when(F.col("v63") > 0, sig.bitwiseOR(F.lit(-(1 << 63)).cast("long"))).otherwise(sig)
    return voted.select("doc_id", sig.alias("simhash"))


def simhash_near_pairs(docs: DataFrame, text_col: str = "text", max_distance: int = 3) -> DataFrame:
    """Hamming-ball pairs via 4-segment pigeonhole blocking.

    distance ≤ 3 across 64 bits ⇒ at least one of the four 16-bit segments
    matches exactly, so candidates come from 4 equi-joins (union'd), then
    exact popcount verification — no cross join at any scale.
    """
    sigs = simhash_signatures(docs, text_col)
    seg = lambda i: F.shiftrightunsigned(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF))  # noqa: E731
    segmented = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("seg_idx"), seg(i).alias("seg_val")) for i in range(4)])
        ).alias("s"),
    ).select("doc_id", "simhash", "s.seg_idx", "s.seg_val")
    a, b = segmented.alias("a"), segmented.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg_val") == F.col("b.seg_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        .distinct()
    )
    dist = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return cands.withColumn("hamming", dist).filter(F.col("hamming") <= max_distance).select(
        "d1", "d2", "hamming"
    )
