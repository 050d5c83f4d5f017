"""Temporal join operators: as-of join, range (interval) join, rollup chain.

None of these exist in the reference (its only join surface is 6-row dim
lookups, SURVEY.md §2.3) and none are Spark built-ins — they are the
canonical "custom operator" set for time-series/feature-store workloads,
implemented here as deliberate shuffle shapes on stock DataFrame ops:

- **as-of join** — union both sides, one shuffle+sort per key, carry the
  latest right payload forward with ``last(ignorenulls)``.  This is O(n log n)
  per key and never materializes candidate pairs, unlike the naive
  inequality-join formulation which Spark would execute as a broadcast
  nested-loop.  At 100 TB: one shuffle of (left ∪ right), no skew beyond the
  key distribution itself.
- **range join** — point-in-interval via *bucketing*: intervals explode to
  the fixed-width time buckets they cover, points map to one bucket, and the
  match becomes an equi-join on (key, bucket) + an exact residual filter.
  Candidate volume is bounded by bucket width ≈ interval length, again
  avoiding the nested-loop plan.
- **rollup chain** — hypertable-style multi-resolution aggregates where each
  coarser grain re-aggregates the *finer aggregate*, not the raw data
  (the continuous-aggregate pattern): the hourly pass reads |5-min buckets|
  rows instead of |events|.  Sums stay fixed-point longs through the chain
  so re-aggregation is exact (functions/exact.py rationale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    right_payload: list[str] | None = None,
    suffix: str = "_r",
    tolerance_us: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the as-of matching right row on the same keys.

    ``direction`` selects the pandas ``merge_asof`` contract:
    ``"backward"`` (default) matches the newest right row with
    ``right.ts <= left.ts``; ``"forward"`` the oldest with
    ``right.ts >= left.ts`` (the same union-and-carry plan traversed in
    descending time); ``"nearest"`` the closer of the two, ties to
    backward — both carries come from ONE shuffle (two sorts share the
    key exchange).

    Left-join semantics: left rows with no matching right row keep nulls.
    Right payload columns come back suffixed (``<col><suffix>``), plus
    ``<ts_col><suffix>`` for the matched right timestamp.

    ``tolerance_us`` bounds the lookback: a match older than ``left.ts −
    tolerance_us`` is treated as no match (payload nulls) — the
    feature-store / trade-quote contract ("most recent quote within T"),
    matching pandas ``merge_asof(tolerance=...)`` and DuckDB ``ASOF JOIN``
    plus a residual filter.  Applied as a null-out on the carried struct in
    the final projection, so the plan shape (one shuffle, one sort) is
    unchanged — no extra join or window.

    Union-and-carry-forward plan: tag sides, union, window per key ordered by
    (ts, side) — right rows sort *before* left rows at equal ts, giving the
    inclusive `<=` semantics — then ``last(payload, ignorenulls)`` carries the
    most recent right payload onto every left row.  One shuffle, one sort.

    The entire right payload (matched timestamp included) travels as ONE
    struct column through the window, so every output field comes from the
    same right row.  Carrying each column independently would mix fields
    from different right rows whenever the newest right row has a NULL in
    one payload column (``last(ignorenulls)`` would backfill just that
    column from an older row).
    """
    right_payload = right_payload or [c for c in right.columns if c not in keys and c != ts_col]
    lpay = [c for c in left.columns if c not in keys and c != ts_col]

    rside = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        F.struct(
            F.col(ts_col).alias("__rts"),
            *[F.col(c).alias(c) for c in right_payload],
        ).alias("__rpay"),
    )
    rpay_type = rside.schema["__rpay"].dataType
    lside = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lpay],
        F.lit(None).cast(rpay_type).alias("__rpay"),
    )
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward/forward/nearest, got {direction!r}"
        )
    unioned = lside.unionByName(rside)

    def _carried(desc: bool):
        # at equal ts the right row (side 0) must precede the left row in
        # traversal order for the inclusive <= / >= semantics — asc side
        # works for both directions
        order = [F.desc(ts_col) if desc else F.asc(ts_col), F.asc("__side")]
        w = (
            W.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        return F.last("__rpay", ignorenulls=True).over(w)

    picks = []
    if direction != "forward":
        picks.append(("__b", _carried(desc=False)))
    if direction != "backward":
        picks.append(("__f", _carried(desc=True)))
    carried = unioned.select(
        *keys,
        ts_col,
        "__side",
        *[F.col(c) for c in lpay],
        *[c.alias(n) for n, c in picks],
    )
    lefts = carried.filter(F.col("__side") == 1)

    # timestamp ts columns compare in integer µs; numeric ts columns
    # (already epoch-µs longs) compare directly
    ts_is_tstamp = isinstance(
        left.schema[ts_col].dataType, (T.TimestampType, T.TimestampNTZType)
    )

    def _us(col: Column) -> Column:
        return F.unix_micros(col) if ts_is_tstamp else col

    lts_us = _us(F.col(ts_col))
    if tolerance_us is not None:
        if direction != "forward":
            ok = _us(F.col("__b.__rts")) >= lts_us - F.lit(tolerance_us)
            lefts = lefts.withColumn(
                "__b", F.when(ok, F.col("__b")).otherwise(F.lit(None).cast(rpay_type))
            )
        if direction != "backward":
            ok = _us(F.col("__f.__rts")) <= lts_us + F.lit(tolerance_us)
            lefts = lefts.withColumn(
                "__f", F.when(ok, F.col("__f")).otherwise(F.lit(None).cast(rpay_type))
            )
    if direction == "backward":
        rp = F.col("__b")
    elif direction == "forward":
        rp = F.col("__f")
    else:
        bdist = lts_us - _us(F.col("__b.__rts"))
        fdist = _us(F.col("__f.__rts")) - lts_us
        rp = F.when(
            F.col("__b").isNotNull()
            & (F.col("__f").isNull() | (bdist <= fdist)),
            F.col("__b"),
        ).otherwise(F.col("__f"))
    lefts = lefts.withColumn("__rpay", rp)
    return lefts.select(
        *keys,
        ts_col,
        *[F.col(c) for c in lpay],
        *[F.col(f"__rpay.{c}").alias(f"{c}{suffix}") for c in right_payload],
        F.col("__rpay.__rts").alias(f"{ts_col}{suffix}"),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts_us",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 600 * 1_000_000,
) -> DataFrame:
    """Pairs (point, interval) with ``start <= point_ts <= end``, same keys.

    Bucketed equi-join: each interval lands in every ``bucket_us``-wide
    bucket it overlaps (``sequence`` + explode, ≤ ⌈len/bucket⌉+1 copies), a
    point lands in exactly one, and the equi-join on (keys, bucket) bounds
    candidates before the exact residual filter.  Pick ``bucket_us`` near the
    typical interval length: shorter buckets → more interval copies, longer
    → more false candidates.  All timestamp math is integer µs.
    """
    b_int = F.explode(
        F.sequence(
            (F.col(start_col) / bucket_us).cast("long"),
            (F.col(end_col) / bucket_us).cast("long"),
        )
    ).alias("__bucket")
    iv = intervals.select(*[F.col(c) for c in intervals.columns], b_int)
    pt = points.withColumn("__bucket", (F.col(point_ts) / bucket_us).cast("long"))
    joined = pt.join(iv, [*keys, "__bucket"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("__bucket")


def rollup_chain(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dims: list[str] | None = None,
    scale: int = 3,
) -> dict[str, DataFrame]:
    """5-min → hour → day continuous-aggregate chain.

    Returns ``{"5m": df, "hour": df, "day": df}``; each level has
    ``bucket_start`` (epoch s), the dims, ``n_events`` and ``fixed_sum``
    (value snapped to ``scale`` decimals, kept as a long so every level
    re-aggregates exactly).  hour reads the 5m aggregate, day reads hour —
    at scale that is the difference between re-scanning 100 TB of raw events
    per grain and re-scanning yesterday's (tiny) finer rollup.
    """
    dims = dims if dims is not None else []
    m = 10**scale

    base = (
        events.groupBy(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / 300) * 300).alias("bucket_start"),
            *[F.col(d) for d in dims],
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * m).cast("long")).alias("fixed_sum"),
        )
    )

    def coarsen(df: DataFrame, span: int) -> DataFrame:
        return (
            df.groupBy(
                (F.floor(F.col("bucket_start") / span) * span).alias("bucket_start"),
                *[F.col(d) for d in dims],
            ).agg(F.sum("n_events").alias("n_events"), F.sum("fixed_sum").alias("fixed_sum"))
        )

    hour = coarsen(base, 3600)
    day = coarsen(hour, 86400)
    return {"5m": base, "hour": hour, "day": day}


def rollup_grains_one_pass(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    dims: list[str] | None = None,
    grains: dict[str, int] | None = None,
    base_span: int = 300,
    scale: int = 3,
) -> DataFrame:
    """All requested grains in a single plan: base agg + GROUPING SETS.

    Where :func:`rollup_chain` returns separate DataFrames per level (the
    continuous-aggregate shape — persist each level, refresh incrementally),
    this emits every grain from ONE pass when they are wanted together in
    the same query: events aggregate once to the base grain (first shuffle),
    each coarser bucket becomes a column, and a GROUPING SETS aggregate
    computes all grains in the second shuffle.  N grains cost 2 shuffles and
    1 scan instead of N× recomputing the base.  Output: ``grain``,
    ``bucket_start`` (epoch s), dims, ``n_events``, ``value_sum``.
    """
    dims = dims if dims is not None else []
    grains = grains or {"hour": 3600, "day": 86400}
    m = 10**scale

    base = (
        events.groupBy(
            (F.floor(F.unix_timestamp(F.col(ts_col)) / base_span) * base_span).alias("__b"),
            *[F.col(d) for d in dims],
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col(value_col) * m).cast("long")).alias("fixed_sum"),
        )
    )
    names = list(grains)
    with_buckets = base.select(
        *[
            (F.floor(F.col("__b") / span) * span).alias(f"__g_{g}")
            for g, span in grains.items()
        ],
        *[F.col(d) for d in dims],
        "n_events",
        "fixed_sum",
    )
    gs = with_buckets.groupingSets(
        [[f"__g_{g}", *dims] for g in names],
        *[F.col(f"__g_{g}") for g in names],
        *[F.col(d) for d in dims],
    ).agg(F.sum("n_events").alias("n_events"), F.sum("fixed_sum").alias("fixed_sum"))
    grain = F.coalesce(
        *[F.when(F.col(f"__g_{g}").isNotNull(), F.lit(g)) for g in names]
    )
    return gs.select(
        F.coalesce(*[F.col(f"__g_{g}") for g in names]).alias("bucket_start"),
        *dims,
        "n_events",
        (F.col("fixed_sum").cast("double") / m).alias("value_sum"),
        grain.alias("grain"),
    )


def finish_rollup(level: DataFrame, scale: int = 3) -> Column | DataFrame:
    """Expose a rollup level with the fixed sum converted back to double."""
    m = float(10**scale)
    return level.select(
        *[c for c in level.columns if c != "fixed_sum"],
        (F.col("fixed_sum").cast("double") / m).alias("value_sum"),
    )


def gap_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_minutes: int = 360,
    scale: int = 2,
) -> DataFrame:
    """Time-bucket aggregation with gap filling + LOCF interpolation.

    TimescaleDB ``time_bucket_gapfill`` / ``locf`` semantics on Spark: per
    key, every bucket between that key's first and last event exists in the
    output — empty buckets get ``n_events = 0`` and carry the most recent
    non-empty bucket's value sum forward (``is_gap`` marks them).

    Plan shape and scale behavior:

    - bucketed aggregate: ONE shuffle keyed (key, bucket), map-side
      partial combine — the only full-data exchange.
    - per-key bounds: a second aggregate over the (already tiny) bucket
      relation; the spine is ``sequence()`` + ``explode`` off those bounds,
      so its size is output-bounded (keys × buckets in range), never
      event-bounded.
    - gap join + LOCF window both partition by the same key, so AQE
      coalesces them onto the aggregate's partitioning; the window is a
      running ``last(ignorenulls)`` — no sort beyond the per-key bucket
      order, state O(1) per key.

    A key × time-range blowup (one key spanning years of buckets) fans out
    in the *spine*, not the shuffle — the knob is ``bucket_minutes``.

    The value sum goes through the fixed-point ``dsum`` grid so LOCF
    carries bit-identical doubles in any engine (functions/exact.py).

    Reference parity: none — the reference has no time-series surface;
    this extends ``hypertable_rollup`` (plans/temporal_queries.py) to
    irregular series, per the driver's extension mandate.
    """
    from ..functions.exact import dsum

    bucket_us = bucket_minutes * 60_000_000
    agg = (
        events.groupBy(
            F.col(key_col),
            F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(value_col, scale).alias("v_sum"),
        )
    )
    bounds = agg.groupBy(key_col).agg(
        F.min("bucket").alias("b_lo"), F.max("bucket").alias("b_hi")
    )
    spine = bounds.select(
        key_col, F.explode(F.sequence("b_lo", "b_hi")).alias("bucket")
    )
    joined = spine.join(agg, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("v_sum", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v_sum").isNull().alias("is_gap"),
    ).orderBy(key_col, "bucket")


def scd2_history(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    attr_col: str = "event_type",
    tiebreak_col: str = "event_id",
    keep_tiebreak: bool = False,
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a change stream into
    validity intervals per key.

    Classic warehouse history tracking: for each key, consecutive rows with
    the same attribute value merge into one interval; a change opens a new
    interval whose ``valid_from`` is the change's event time and closes the
    previous one (``valid_to`` = next change, NULL while current).

    Two window passes over the SAME (key, time) partitioning — one
    exchange, one sort, reused by both ``lag`` (change detection) and
    ``lead`` (interval close); the filter between them shrinks the data
    before the second pass.  The tiebreaker makes same-timestamp ordering
    deterministic under retries and across engines.

    Reference parity: generalizes the reference's latest-record upsert
    cursor (SURVEY §2 T2/J4 — it keeps only the newest state) into full
    history retention.

    ``keep_tiebreak`` appends the opening event's tiebreak value as
    ``tb`` — the streaming maintainer (``streaming/incremental.py:
    maintain_scd2_history``) stores it so a stored current interval can be
    replayed as a pseudo-event with its original deterministic sort key.
    """
    order = [F.expr(f"unix_micros({ts_col})").asc(), F.col(tiebreak_col).asc()]
    w = W.partitionBy(key_col).orderBy(*order)
    changes = (
        events.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
        .drop("_prev")
    )
    w2 = W.partitionBy(key_col).orderBy(*order)
    cols = [
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.expr(f"unix_micros({ts_col})").alias("valid_from_us"),
        F.lead(F.expr(f"unix_micros({ts_col})")).over(w2).alias("valid_to_us"),
    ]
    if keep_tiebreak:
        cols.append(F.col(tiebreak_col).alias("tb"))
    return changes.select(*cols).withColumn(
        "is_current", F.col("valid_to_us").isNull()
    )


def state_at_times(
    history: DataFrame,
    at_us: list[int],
    key_col: str = "user_id",
) -> DataFrame:
    """Time travel over SCD2 validity intervals: reconstruct the dimension
    state at each probe timestamp — (as_of_us, key, attr) rows for every
    interval containing the probe.

    One map-only pass: each history row explodes exactly the probes its
    ``[valid_from_us, valid_to_us)`` interval contains via a higher-order
    ``filter`` over the (tiny, literal) probe array — no join, no
    shuffle, output bounded by |history| × |probes|.  The open interval
    convention matches :func:`scd2_history`: ``valid_to_us`` NULL means
    current, and a probe equal to ``valid_to_us`` belongs to the NEXT
    interval (half-open).

    Probing at arbitrary per-row timestamps (a probe *relation* rather
    than a literal list) is the point-in-interval range join —
    :func:`range_join` with interval bucketing; this operator is the
    broadcast-degenerate case where the probe side fits in the plan.
    """
    arr = F.array(*[F.lit(int(t)).cast("long") for t in at_us])
    contained = F.filter(
        arr,
        lambda t: (F.col("valid_from_us") <= t)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > t)),
    )
    return history.select(
        F.explode(contained).alias("as_of_us"),
        F.col(key_col),
        F.col("attr"),
    )
