"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point of these formulations):

- **exact**: hash-groupBy on the text digest — one shuffle on a 32-char key,
  never on the text itself.
- **ngram Jaccard**: inverted shingle index (explode → self-equi-join on the
  shingle → pair-count) — the join key is the shingle, so the shuffle
  distributes by shingle and hot shingles are the skew risk; a document-
  frequency cap (``max_df``) drops ubiquitous shingles, which is both the
  standard IR trick and the skew guard at 100 TB.
- **MinHash+LSH**: one ``xxhash64`` per shingle computed *inside the row*
  (``transform`` over the shingle array — no explode, no shuffle), then the
  k "permutations" are universal re-hashes ``a_i·h + b_i (mod 2^64)`` of
  that base hash, minimized per doc in one vectorized numpy kernel (the
  same one-hash/k-rehash scheme ``pyspark.ml``'s MinHashLSH uses).  Banding
  turns candidate generation into an equi-join on (band, band-hash); only
  candidate pairs get exact verification.  This is the linear-ish scale
  path: no O(n²) anywhere, and signatures are a map-only stage.
- **SimHash**: 64-bit signature from shingle-hash bit votes — hashes
  JVM-side per row, votes/packing vectorized in numpy.  Hamming-ball
  search via 4-segment blocking (pigeonhole: distance ≤3 ⇒ one of 4
  16-bit segments equal) — again an equi-join, no cross product.

Base hashing is ``xxhash64`` (JVM, deterministic); the numpy kernels use
fixed constants, so results are reproducible across runs/partitionings.
(The earlier formulation aggregated 64 vote/min columns over an exploded
shingle stream — correct, but it paid a shuffle plus a multi-second
whole-stage-codegen compile for the 64-wide aggregate; the row-local
Arrow-batched kernels are ~5× faster end-to-end and shuffle-free.)
LSH-family ops are verified against the exact-Jaccard oracle in tests
rather than DuckDB (no matching hash function there — the driver records
them as rows-only checks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.pandas.functions import pandas_udf

from .text import shingles_col
from .util import spread as _spread


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
    docs = _spread(docs)
    sh = docs.select(
        "doc_id",
        F.explode(shingles_col(text_col, n)).alias("shingle"),
    )
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = sh.join(df_counts.filter(F.col("df") <= max_df).select("shingle"), "shingle")
    return sh


def _index_with_sizes(idx: DataFrame) -> DataFrame:
    """Attach each doc's (capped) shingle-set size to its index entries.

    A count-over-window partitioned by doc_id computes the size inside the
    same pass that builds the index — one shuffle, no separate aggregate +
    join back, and exactly ONE cache materialization (an earlier two-persist
    version measured 3x the build cost at sf0.1).  The persisted result
    feeds both self-join branches of the pair generation.
    """
    from pyspark.sql import Window

    out = idx.withColumn(
        "n_sh", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
    ).persist()
    out.count()
    return out


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 4,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-set Jaccard ≥ threshold (exact).

    co-occurrence counts come from the inverted index self-join (candidates
    only — pairs sharing no shingle never materialize).  Jaccard =
    co/(n1+n2-co) is exact integer arithmetic + one double division, so it
    is engine-independent.

    Scale shape: per-doc set sizes are attached to the INDEX before the
    self-join (one extra int per index entry) and ride through the pair
    aggregation as grouping keys, instead of joining a sizes table onto the
    aggregated pairs afterwards.  The pair relation is the largest
    intermediate of this operator (up to Σ_shingle df² candidate rows before
    aggregation), so the former shape — shuffle pairs by d1, then again by
    d2, for two hash joins — moved the most data of any stage; carrying 8
    bytes per index entry eliminates both pair-level shuffles.  The index
    (now with sizes) is persisted once and feeds both self-join branches.
    """
    idx = _index_with_sizes(shingle_index(docs, text_col, n, max_df))
    a = idx.alias("a")
    b = idx.alias("b")
    co = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("d1"),
            F.col("b.doc_id").alias("d2"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    jac = F.col("co").cast("double") / (F.col("n1") + F.col("n2") - F.col("co"))
    return (
        co.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def dedup_against(
    new_docs: DataFrame,
    existing_docs: DataFrame,
    text_col: str = "text",
    n: int = 4,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental dedup: flag ``new_docs`` rows that duplicate the
    *existing* corpus — the nightly-crawl-vs-reference-corpus operator.

    Output: one row per new doc — ``(doc_id, dup_exact, dup_near)``;
    callers keep ``~dup_exact & ~dup_near`` (within-new duplicates are the
    job of the single-corpus operators, which compose before/after this).

    Scale design: the existing corpus never joins as documents — it appears
    only as (a) a distinct 32-byte digest set for the exact anti-check and
    (b) an inverted shingle index the new side's index equi-joins against.
    Work is proportional to the NEW corpus plus the index probe — there is
    no existing×existing term, so re-running nightly against an
    ever-growing reference corpus stays linear in the night's crawl.
    ``max_df`` caps each side's index exactly as in
    :func:`ngram_jaccard_pairs` (ubiquitous shingles are the skew risk).
    """
    new_digests = new_docs.select("doc_id", F.md5(F.col(text_col)).alias("digest"))
    ex_digests = existing_docs.select(F.md5(F.col(text_col)).alias("digest")).distinct()
    exact = new_digests.join(ex_digests, "digest", "left_semi").select("doc_id")

    # Sizes ride through the pair aggregation as grouping keys (same
    # pair-level-shuffle elimination as ngram_jaccard_pairs — see there).
    new_idx = _index_with_sizes(shingle_index(new_docs, text_col, n, max_df))
    ex_idx = _index_with_sizes(shingle_index(existing_docs, text_col, n, max_df))
    a, b = new_idx.alias("a"), ex_idx.alias("b")
    co = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.doc_id").alias("nid"),
            F.col("b.doc_id").alias("eid"),
            F.col("a.n_sh").alias("n1"),
            F.col("b.n_sh").alias("n2"),
        )
        .agg(F.count(F.lit(1)).alias("co"))
    )
    jac = F.col("co").cast("double") / (F.col("n1") + F.col("n2") - F.col("co"))
    near = (
        co.filter(jac >= threshold)
        .select(F.col("nid").alias("doc_id"))
        .distinct()
    )
    return (
        new_docs.select("doc_id")
        .join(exact.withColumn("dup_exact", F.lit(True)), "doc_id", "left")
        .join(near.withColumn("dup_near", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("dup_exact", F.lit(False)).alias("dup_exact"),
            F.coalesce("dup_near", F.lit(False)).alias("dup_near"),
        )
    )


def _shingle_hashes(text_col: str, n: int) -> Column:
    """Row-local array of xxhash64 values, one per distinct shingle.

    ``transform`` keeps hashing inside the row — the signature stages below
    never explode, so signature computation is a map-only pass at any scale.
    """
    return F.transform(shingles_col(text_col, n), lambda s: F.xxhash64(s))


def _flat_hash_batch(hash_arrays: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate a batch of per-doc hash arrays → (flat uint64, row offsets)."""
    lens = hash_arrays.map(len).to_numpy(dtype=np.int64)
    if lens.sum() == 0:
        return np.empty(0, dtype=np.uint64), lens
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in hash_arrays])
    return flat.view(np.uint64), lens


def _minhash_consts(k: int) -> tuple[np.ndarray, np.ndarray]:
    """Fixed odd multipliers / offsets for the k universal re-hashes (mod 2^64).

    A fresh seeded RandomState per call: every invocation (and every driver
    process) gets identical constants for a given k, so signatures, band
    hashes, and candidate sets are reproducible across repeated in-process
    runs — a shared module-level RNG would advance between calls.
    """
    rng = np.random.RandomState(0xD2A)
    a = rng.randint(0, 2**63, size=k, dtype=np.uint64) * 2 + 1
    b = rng.randint(0, 2**63, size=k, dtype=np.uint64)
    return a, b


def minhash_signatures(
    docs: DataFrame, text_col: str = "text", n: int = 4, k: int = 64
) -> DataFrame:
    """k-permutation MinHash signature per document — map-only.

    One JVM ``xxhash64`` per shingle inside the row, then the k permutations
    are ``min(a_i·h + b_i mod 2^64)`` computed in a single vectorized numpy
    kernel per Arrow batch (``np.minimum.reduceat`` over the concatenated
    batch).  No explode, no shuffle; signature is an array<long> column.
    Docs with no shingles (shorter than ``n`` tokens) are excluded, matching
    the exploded formulation this replaces.
    """
    a, b = _minhash_consts(k)

    @pandas_udf(T.ArrayType(T.LongType()))
    def _kmin(hashes: pd.Series) -> pd.Series:
        out: list[np.ndarray] = []
        # chunk so the (n_shingles, k) rehash matrix stays ~tens of MB
        for lo in range(0, len(hashes), 1024):
            flat, lens = _flat_hash_batch(hashes.iloc[lo : lo + 1024])
            if flat.size == 0:
                out.extend([np.empty(0, dtype=np.int64)] * min(1024, len(hashes) - lo))
                continue
            rehashed = flat[:, None] * a[None, :] + b[None, :]  # wraps mod 2^64
            mins = np.minimum.reduceat(rehashed, np.cumsum(lens) - lens, axis=0)
            out.extend(mins.view(np.int64))
        return pd.Series(out)

    return _spread(docs).select("doc_id", _shingle_hashes(text_col, n).alias("hh")).filter(
        F.size("hh") > 0
    ).select("doc_id", _kmin("hh").alias("signature"))


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

    Signatures are persisted before the band self-join: both join branches
    (and at scale, every band) reread the materialized signatures instead of
    recomputing the hash kernels per branch.  On a real corpus you would
    write them to a table — they are a reusable artifact.
    """
    sigs = minhash_signatures(docs, text_col, n, k).persist()
    sigs.count()  # materialize once, eagerly
    cands = minhash_lsh_candidates(sigs, bands, k // bands)
    sh = _spread(docs).select("doc_id", shingles_col(text_col, n).alias("sh")).persist()
    sh.count()  # both verify branches read the cache, not recompute shingling
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
    """64-bit SimHash per document from shingle-hash bit votes — map-only.

    Features are word n-gram shingles (tokens alone are far too weakly
    discriminating on small-vocabulary corpora — every doc shares most of
    the token set).  For each bit position: +1 if the shingle's xxhash64 has
    the bit set, -1 otherwise; the signature bit is the vote sign (ties
    vote 0).  Hashes come from one row-local JVM ``xxhash64`` per shingle;
    the 64 bit-votes and the final bit-pack run as one numpy kernel per
    Arrow batch.  Docs with no shingles are excluded, as in the exploded
    64-wide-aggregate formulation this replaces.
    """
    @pandas_udf(T.LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        sigs = np.zeros(len(hashes), dtype=np.int64)
        for lo in range(0, len(hashes), 1024):
            chunk = hashes.iloc[lo : lo + 1024]
            flat, lens = _flat_hash_batch(chunk)
            if flat.size == 0:
                continue
            # little-endian byte view → per-hash bit matrix, 1 byte per bit
            bits = np.unpackbits(flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
            ones = np.add.reduceat(bits, np.cumsum(lens) - lens, axis=0, dtype=np.int64)
            # vote_i = ones - (len - ones) > 0  ⇔  2·ones > len
            sig_bits = (2 * ones > lens[:, None]).astype(np.uint8)
            packed = np.packbits(sig_bits, axis=1, bitorder="little")
            sigs[lo : lo + len(chunk)] = packed.view(np.int64).ravel()
        return pd.Series(sigs)

    return _spread(docs).select("doc_id", _shingle_hashes(text_col, n).alias("hh")).filter(
        F.size("hh") > 0
    ).select("doc_id", _simhash("hh").alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame | None = None,
    text_col: str = "text",
    max_distance: int = 3,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Hamming-ball pairs via 4-segment pigeonhole blocking.

    distance ≤ 3 across 64 bits ⇒ at least one of the four 16-bit segments
    matches exactly, so candidates come from 4 equi-joins (union'd), then
    exact popcount verification — no cross join at any scale.  Signatures
    are persisted so the segment self-join's two branches reuse one
    materialization (see :func:`minhash_dedup_pairs`); pass ``signatures``
    (a (doc_id, simhash) frame, ideally already persisted) to share one
    signature computation with other consumers.
    """
    if signatures is not None:
        sigs = signatures
    elif docs is None:
        raise ValueError("simhash_near_pairs: pass either docs or signatures")
    else:
        sigs = simhash_signatures(docs, text_col).persist()
        sigs.count()
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
