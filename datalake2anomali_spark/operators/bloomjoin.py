"""Bloom-filter semi-join reduction: shrink the shuffled side of a join
whose build side is too big to broadcast but whose KEY SET is small
relative to the probe's row count.

The 100 TB problem: ``fact ⋈ filtered_dim`` where the filtered dim is a
few GB (over the broadcast threshold) moves EVERY fact row through the
join shuffle, even though most fact rows match no dim key.  The classic
fix — what Spark's own runtime bloom-filter join rewrite
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) and every
warehouse's "join filter" do — is to build a bloom filter over the build
side's keys in one aggregate pass, broadcast the (KB–MB) bitmap, and
filter the probe BEFORE its shuffle.  A bloom negative is definitive, so
no matching row is ever lost; false positives just ride the shuffle and
fall out of the real join.  This module is that rewrite as an explicit,
engine-visible operator with deterministic geometry (Spark's optimizer
version only fires under cost heuristics and cannot be steered per-join).

Everything stays JVM-side / whole-stage-codegen: one ``xxhash64`` per
probe row, ``k`` bit tests against a broadcast ``array<long>`` bitmap
(Kirsch–Mitzenmacher double hashing — ``pos_i = h1 + i·h2 mod m`` — the
same derivation Spark's ``BloomFilterImpl`` uses), no Python in the hot
path.  Driver-side state is the bitmap itself: ``m_bits/64`` longs,
collected from a ``bit_or`` aggregate whose output is bounded by the
word count, never by rows.

Geometry ceiling (VERDICT r7 #7): the whole bitmap travels as ONE row —
an ``array<long>`` field in a 1-row broadcast — so ``m_bits`` is capped
at :data:`MAX_M_BITS` (2^26 bits = 8 MiB = 1M longs).  Past that, a
single row stops being a sane unit of transfer (driver collect of the
``bit_or`` words, task-deserialized broadcast copy per executor, codegen
over a multi-MB constant), and at 10 bits/key the cap already serves
~6.7M build keys at ~1% FPR — a build side with more distinct keys than
that is no longer "small key set vs huge probe", and the right tool is
Spark's own runtime bloom join or a plain shuffle join.  Oversized
requests raise rather than degrade.

Reference parity: none — extension operator (join-optimization family
alongside the broadcast dim joins of plans/relational.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Default filter geometry: 2^17 bits (16 KiB) holds ~13k keys at k=5
#: under 1% false positives; size up for bigger key sets (10 bits/key
#: keeps FPR ≈ 1%).
DEFAULT_M_BITS = 1 << 17
DEFAULT_K = 5
#: Hard geometry ceiling: the bitmap is a single array<long> row (driver
#: collect + per-executor broadcast copy + codegen constant), so 2^26
#: bits (8 MiB, ~6.7M keys at 1% FPR) is where "one row" stops being a
#: sane transfer unit — see the module docstring.
MAX_M_BITS = 1 << 26


def _check_geometry(m_bits: int, k: int) -> None:
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if not 1 <= k <= 16:
        raise ValueError("k must be between 1 and 16")
    if m_bits > MAX_M_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds MAX_M_BITS={MAX_M_BITS} (8 MiB "
            "single-row bitmap, ~6.7M keys at 1% FPR); a build side that "
            "large should use Spark's runtime bloom join or a plain "
            "shuffle join instead"
        )


def _pos_sql(i: int, m_bits: int) -> str:
    """SQL for the i-th bit position from a pre-hashed ``_h`` column, via
    double hashing (the DataFrame shift functions require literal shift
    amounts, so the per-row shifts live in SQL expressions)."""
    return (
        f"pmod((_h & 4294967295) + {i} * shiftrightunsigned(_h, 32), {m_bits})"
    )


def build_key_bloom(
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """One-pass bloom bitmap over ``build[key]`` as ``m_bits/64`` longs.

    Plan: explode the k positions per row, ``bit_or`` the single-bit
    words per word index — a map-side-combined aggregate whose shuffle
    and collect are bounded by the word count.  NULL keys are skipped
    (they can never equi-join).
    """
    _check_geometry(m_bits, k)
    n_words = m_bits // 64
    pos_arr = ", ".join(_pos_sql(i, m_bits) for i in range(k))
    rows = (
        build.filter(F.col(key).isNotNull())
        .withColumn("_h", F.xxhash64(F.col(key)))
        .select(F.explode(F.expr(f"array({pos_arr})")).alias("_pos"))
        .select(
            F.expr("_pos div 64").alias("_w"),
            F.expr("shiftleft(1L, cast(_pos % 64 as int))").alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_bit").alias("_word"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[int(r["_w"])] = int(r["_word"])
    return words


def bloom_semi_reduce(
    probe: DataFrame,
    words: list[int],
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Rows of ``probe`` whose ``key`` MIGHT be in the filter — a superset
    of the true semi-join (bloom negatives are definitive, so this is
    always safe to feed an exact join afterwards).  The bitmap rides a
    1-row broadcast cross join; every bit test is a codegen'd
    ``element_at >> shift & 1``."""
    _check_geometry(m_bits, k)
    if len(words) != m_bits // 64:
        raise ValueError(
            f"bitmap has {len(words)} words but m_bits={m_bits} implies "
            f"{m_bits // 64}; build and probe must share one geometry"
        )
    spark = probe.sparkSession
    bmp = spark.createDataFrame(
        [(words,)], T.StructType([T.StructField("_bloom", T.ArrayType(T.LongType()))])
    )
    tests = " AND ".join(
        "(shiftrightunsigned("
        f"element_at(_bloom, cast({_pos_sql(i, m_bits)} div 64 as int) + 1), "
        f"cast({_pos_sql(i, m_bits)} % 64 as int)) & 1) = 1"
        for i in range(k)
    )
    return (
        probe.withColumn("_h", F.xxhash64(F.col(key)))
        .crossJoin(F.broadcast(bmp))
        .filter(F.col(key).isNotNull() & F.expr(tests))
        .drop("_bloom", "_h")
    )


def bloom_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact inner equi-join with the probe side bloom-reduced first.

    Result-identical to ``probe.join(build, probe ⋈ build)`` — the real
    join removes the bloom's false positives — but the probe rows
    entering the join shuffle are only those that can match, which at
    100 TB is the difference between shuffling the table and shuffling
    the (usually tiny) matching fraction.
    """
    words = build_key_bloom(build, build_key, m_bits, k)
    reduced = bloom_semi_reduce(probe, words, probe_key, m_bits, k)
    # alias both sides: with probe_key == build_key (the common shape) an
    # unqualified column condition is ambiguous and raises
    return reduced.alias("_probe").join(
        build.alias("_build"),
        F.col(f"_probe.{probe_key}") == F.col(f"_build.{build_key}"),
    )
