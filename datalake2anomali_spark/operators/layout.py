"""Z-order (Morton-curve) data layout for multi-dimensional file skipping.

At 100 TB, the cheapest predicate is the one that never reads a file: parquet
footers carry per-file/per-row-group min-max stats, and a scan prunes any
file whose stats exclude the predicate.  A single-column sort gives perfect
pruning on that column and *zero* pruning on every other — each file spans
the full range of the unsorted dims.  Interleaving the bits of two dims into
one sort key (the Morton / Z-order curve, the layout behind Delta/Iceberg
``ZORDER BY``) bounds every file to a small rectangle in *both* dims, so
selective predicates on either column skip most files.

Everything here is JVM-side built-ins (shiftleft / bitwiseAND / bitwiseOR)
inside whole-stage codegen — the key costs a few ALU ops per row, and the
layout write is one range-repartition exchange + a local sort, exactly what
a plain ``ORDER BY`` layout costs.

The bit-spread chain is the classic magic-number construction (public
domain, e.g. "Bit Twiddling Hacks"); the SQL mirror emits the identical
chain so a DuckDB oracle can verify keys bit-for-bit.

Reference parity: the reference has no storage layout at all (in-memory
lists, SURVEY §1); this is part of the driver-mandated 100-TB extension
surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (shift, mask) chain spreading a 16-bit int so its bits occupy even
# positions of a 32-bit int: 0x00FF00FF, 0x0F0F0F0F, 0x33333333, 0x55555555.
_SPREAD_STEPS: tuple[tuple[int, int], ...] = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    x = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _spread16_sql(expr: str) -> str:
    x = f"(({expr}) & 65535)"
    for shift, mask in _SPREAD_STEPS:
        x = f"((({x} | ({x} << {shift}))) & {mask})"
    return x


def zorder_key2(a: Column | str, b: Column | str) -> Column:
    """Morton key interleaving the low 16 bits of two integer columns.

    Bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1 — sorting by
    the key alternates splits between the two dims.  Scale both inputs to
    the same bit width first (``scale_to_bits``) or the wider dim dominates
    the high bits and the curve degenerates to a single-column sort.
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_key2_sql(a_expr: str, b_expr: str) -> str:
    """DuckDB-SQL twin of :func:`zorder_key2` (bit-identical)."""
    return f"({_spread16_sql(a_expr)} | ({_spread16_sql(b_expr)} << 1))"


def scale_to_bits(c: Column | str, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Linear-rank a value into ``[0, 2^bits)`` given its min/max columns.

    Integer arithmetic only (``div``), so any engine reproduces it exactly.
    ``lo``/``hi`` are columns (typically broadcast-joined global aggregates)
    so the whole computation stays in one lazy plan.
    """
    c = F.col(c) if isinstance(c, str) else c
    top = F.lit((1 << bits) - 1)
    span = F.greatest(hi - lo, F.lit(1))
    num = (c - lo) * top
    # exact integer floor-div: (num - num % span) is divisible by span, and
    # the correctly-rounded double division of exactly-divisible longs this
    # small (< 2^53) is the exact integer quotient
    return ((num - num % span) / span).cast("long")


def scale_to_bits_sql(expr: str, lo: str, hi: str, bits: int = 8) -> str:
    top = (1 << bits) - 1
    return (
        f"((({expr}) - ({lo})) * {top} // GREATEST(({hi}) - ({lo}), 1))"
    )


def write_zordered(
    df: DataFrame,
    a: Column | str,
    b: Column | str,
    path: str,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered along the Z-curve of two dims.

    One range-repartition on the Morton key (sampled range boundaries give
    near-equal file sizes — no skew on hot key values, unlike hash) + a
    sort-within-partitions so row groups inside each file are also
    stat-tight.  The key column is dropped before writing; it is a pure
    function of the dims and cheap to recompute.
    """
    keyed = df.withColumn("_zkey", zorder_key2(a, b))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
