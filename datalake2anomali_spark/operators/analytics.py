"""Product-analytics operators: ordered funnels, cohort retention, EWMA.

These are the classic event-analytics workloads (Amplitude/Mixpanel-style
funnels and retention, feature-store decay features) re-expressed as
single-pass Spark window/aggregate plans.  The reference connector has no
analytics operators (682-LoC REST client, ``src/Datalake2Anomali.py``);
this module belongs to the large-scale pipeline extension surface the
build brief mandates.

Scale design notes (the part that matters at 100 TB):

- :func:`funnel_steps` computes a strict *ordered* funnel (step k counts
  only events after the user's step k-1 time) in **one shuffle** on the
  entity key.  The naive formulation is k-1 self-joins of the event table
  with inequality predicates — k shuffles of the full fact table and a
  skew hazard per hot user.  Instead, running conditional minima over one
  ``(user, ts)``-sorted window give each row the earliest qualifying
  prior-step time, and the final per-user aggregate reuses the window's
  hash partitioning, so Catalyst plans exactly one exchange end to end.
- :func:`cohort_retention` shuffles the fact table twice (once to find
  each user's cohort via a window min, once for the distinct-user count
  per ``(cohort, week_offset)`` cell) — both on keys with bounded
  cardinality blowup.  Week indices are absolute integer epoch-weeks
  (``unix_micros div 604_800_000_000``), a per-row integer op identical
  in any engine, rather than engine-flavored ``date_trunc`` semantics.
- :func:`ewma_features` materializes the decayed feature with a bounded
  ``ROWS BETWEEN depth-1 PRECEDING`` window array and a JVM-side
  higher-order ``aggregate`` fold — no Python UDF, state bounded by
  ``depth`` per row.  The fold uses scaled-integer arithmetic
  (``x + (acc >> 1)``, an exact arithmetic right-shift), so results are
  bit-identical regardless of partitioning or engine; a float
  ``pow(alpha, k)`` formulation would drift in the last ulps across
  engines and fail exact comparison (see ``functions/exact.py`` for the
  same design argument).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Microseconds per (absolute, epoch-aligned) retention week.
WEEK_US = 7 * 86_400 * 1_000_000


def funnel_steps(
    events: DataFrame,
    steps: Sequence[str],
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Strict ordered-funnel timestamps per entity, one shuffle total.

    For ``steps = [s1, s2, ..., sk]``: ``t1`` is the entity's earliest
    ``s1`` event; ``t_i`` (i>1) is the earliest ``s_i`` event *strictly
    after* ``t_{i-1}``.  Output is one row per entity seen in ``events``:
    ``(entity, step1_us, ..., stepK_us, steps_completed)`` with unreached
    steps NULL.  Strictness is on the raw timestamp (an ``s2`` at exactly
    ``t1`` does not advance the funnel) — the conventional "conversion
    takes nonzero time" contract.

    How one shuffle suffices: over a single ``(entity, ts, order_col)``
    window, the running ``min(CASE step_i-qualifies THEN ts END)`` at any
    row equals the entity's final ``t_i`` restricted to events at or
    before that row, so each row can decide "does this event qualify for
    step i+1" from the running value of step i — no join back.  The
    closing per-entity ``min`` aggregates reuse the window's hash
    partitioning (no second exchange).
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events
    qual_cols: list[str] = []
    prev_run: Column | None = None
    for i, step in enumerate(steps, start=1):
        is_step = F.col(type_col) == step
        if prev_run is None:
            qual = F.when(is_step, F.col(ts_col))
        else:
            qual = F.when(is_step & (prev_run < F.col(ts_col)), F.col(ts_col))
        qc = f"_q{i}"
        df = df.withColumn(qc, qual)
        qual_cols.append(qc)
        prev_run = F.min(qc).over(w)
    aggs = [
        F.unix_micros(F.min(qc)).alias(f"step{i}_us")
        for i, qc in enumerate(qual_cols, start=1)
    ]
    done = sum(
        F.when(F.col(f"step{i}_us").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return (
        df.groupBy(F.col(entity_col).alias("entity"))
        .agg(*aggs)
        .withColumn("steps_completed", done.cast("int"))
    )


def cohort_retention(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort-retention matrix over an event stream.

    An entity's *cohort* is the absolute epoch-week of its first event;
    for every later activity week the entity lands in cell
    ``(cohort_week, week_offset)``.  Output:
    ``(cohort_week, week_offset, active_entities)`` — the raw retention
    triangle (exact distinct counts; ratios are a trivial post-join the
    caller can do against ``week_offset = 0``).

    Two shuffles: a window min on the entity key assigns cohorts without
    materializing a separate first-event dimension table (and without the
    join back that a groupBy-min formulation needs), then the distinct
    aggregation on the (already small) cell key.  Epoch-week arithmetic is
    ``unix_micros div WEEK_US`` — integer, engine-neutral, no timezone or
    week-start convention to diverge on.
    """
    # integer `div` end-to-end — no float division, no timezone-dependent
    # date_trunc convention to diverge on between engines
    week = F.expr(f"unix_micros({ts_col}) div {WEEK_US}")
    w = Window.partitionBy(entity_col)
    cohort = F.min(week).over(w)
    return (
        events.select(
            F.col(entity_col).alias("entity"),
            week.alias("_week"),
            cohort.alias("cohort_week"),
        )
        .groupBy("cohort_week", (F.col("_week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("entity").alias("active_entities"))
    )


def ewma_features(
    events: DataFrame,
    value_col: str = "value",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    depth: int = 10,
    scale: int = 3,
) -> DataFrame:
    """Per-entity exponentially-decayed feature (α = 1/2), exact integers.

    For each event, folds the entity's last ``depth`` values (event-time
    order, inclusive) through ``acc' = x + (acc >> 1)`` on values snapped
    to ``scale`` decimal places — i.e. ``Σ round(x_{n-k}·10^s) · 2^{-k}``
    with floor at every halving.  The α = 1/2 dyadic decay makes the fold
    pure integer ops (an arithmetic shift *is* floor-division by two, for
    negatives too), so the feature is bit-identical across engines,
    partitionings, and retries — the property a training pipeline needs
    for reproducible features.  Truncating at ``depth`` loses at most
    ``max|x|·2^{-depth}`` of mass (< 0.1% at the default 10).

    Plan shape: one shuffle (the entity window); the ``collect_list`` over
    a ``ROWS depth-1 PRECEDING`` frame bounds per-row state at ``depth``
    longs, and the fold is Catalyst's higher-order ``aggregate`` — fully
    JVM-side, no Python in the loop.
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(-(depth - 1), Window.currentRow)
    )
    snapped = F.round(F.col(value_col) * (10**scale)).cast("long")
    arr = F.collect_list(snapped).over(w)
    fold = F.aggregate(
        arr,
        F.lit(0).cast("long"),
        lambda acc, x: x + F.shiftright(acc, 1),
    )
    return events.select(
        order_col,
        F.col(entity_col).alias("entity"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        fold.alias("ewma_scaled"),
    )


def rolling_median(
    events: DataFrame,
    value_col: str = "value",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    depth: int = 9,
    scale: int = 3,
) -> DataFrame:
    """Per-event rolling median of the entity's last ``depth`` values
    (event-time order, inclusive) — the robust-location twin of
    :func:`ewma_features`, same exact-integer design.

    Median of n scaled ints = floor of the average of the two middle
    order statistics (equal for odd n) — pure integer ops over an
    ``array_sort`` of the bounded window array, so the feature is
    bit-identical across engines; a float ``percentile`` would not be.
    One shuffle (entity window); per-row state is ``depth`` longs and the
    sort is O(depth log depth) row-local — no global ordering anywhere.
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(-(depth - 1), Window.currentRow)
    )
    snapped = F.round(F.col(value_col) * (10**scale)).cast("long")
    arr = F.array_sort(F.collect_list(snapped).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2).cast("int") + 1)
    return events.select(
        order_col,
        F.col(entity_col).alias("entity"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.shiftright(lo + hi, 1).alias("median_scaled"),
    )


def markov_transitions(
    events: DataFrame,
    type_col: str = "event_type",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every (from_type, to_type) the transition count and
    the row-normalized probability in exact parts-per-``scale``
    (``(n · scale) div row_total`` — integer, engine-identical; float
    division would drift in the last ulp and break exact comparison).

    Plan: one shuffle for the per-entity ``lag`` window, a map-side-
    combined count on the (from, to) key — cardinality = |types|², tiny —
    and a window sum over ``from_type`` for the row totals (no second
    scan of the fact table; the totals window runs on the already-
    aggregated matrix).  This is the sequence-prior builder for session
    modeling / next-event prediction features.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.withColumn("_row_total", total).select(
        "from_type",
        "to_type",
        "n",
        F.expr(f"(n * {scale}) div _row_total").alias("p_ppm"),
    )


def robust_outliers(
    events: DataFrame,
    value_col: str = "value",
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    depth: int = 9,
    scale: int = 3,
    k_times_mad: int = 5,
) -> DataFrame:
    """Rolling median/MAD outlier flags — the robust anomaly detector
    (mean/stddev z-scores break exactly when needed most: the outlier
    drags both).  Per event, over the entity's trailing ``depth`` values:
    ``med`` = rolling median, ``mad`` = median of |x − med|, outlier ⇔
    |x − med| > k·mad.  Hampel-filter semantics with k applied to the
    raw MAD (no 1.4826 normal-consistency factor — integer exactness
    beats unit-matching for a flag).

    All arithmetic on snapped integers (same shiftright floor-mean order
    statistics as :func:`rolling_median`), so flags are bit-identical
    across engines — no float epsilon at the decision boundary.  One
    shuffle; per-row state 2·depth longs; both medians are row-local
    higher-order expressions over the same window array (the array is
    built once and reused via a projected column).
    """
    w = (
        Window.partitionBy(entity_col)
        .orderBy(ts_col, order_col)
        .rowsBetween(-(depth - 1), Window.currentRow)
    )
    snapped = F.round(F.col(value_col) * (10**scale)).cast("long")

    def _median(arr: Column) -> Column:
        s = F.array_sort(arr)
        n = F.size(s)
        lo = F.element_at(s, ((n + 1) / 2).cast("int"))
        hi = F.element_at(s, (n / 2).cast("int") + 1)
        return F.shiftright(lo + hi, 1)

    base = events.select(
        order_col,
        F.col(entity_col).alias("entity"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        snapped.alias("_x"),
        F.collect_list(snapped).over(w).alias("_arr"),
    )
    base = base.withColumn("_med", _median(F.col("_arr")))
    dev = F.transform(F.col("_arr"), lambda v: F.abs(v - F.col("_med")))
    base = base.withColumn("_mad", _median(dev))
    return base.select(
        order_col,
        "entity",
        "ts_us",
        F.col("_med").alias("median_scaled"),
        F.col("_mad").alias("mad_scaled"),
        (F.abs(F.col("_x") - F.col("_med")) > k_times_mad * F.col("_mad")).alias(
            "is_outlier"
        ),
    )


def cooccurrence_similarity(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket: int = 256,
) -> DataFrame:
    """Item–item cosine similarity from basket co-occurrence — the
    collaborative-filtering "related items" primitive:
    ``cos(i,j) = c_ij / √(c_i·c_j)`` with ``c_ij`` = baskets containing
    both, ``c_i`` = baskets containing i.

    Plan: distinct (basket, item) → within-basket self-join (i < j) →
    pair counts, filtered to ``min_pair_support`` BEFORE the marginals
    join (the support filter is what keeps the pair relation from being
    quadratic noise — same argument as the triangle query's affinity
    threshold); item marginals are one groupBy, joined onto the surviving
    pairs twice.  Baskets larger than ``max_basket`` are dropped whole:
    a hot basket fans out quadratically and a 10⁶-item "basket" is
    telemetry junk, not signal — the cap is the skew guard (logged
    contract, not silent: it's in the function's signature).

    Scores round to 6 digits — √ and ÷ are correctly-rounded IEEE ops,
    identical across engines; the rounding only pins the final digit
    (same convention as ``llm/search.py: bm25_scores``).

    Output: (item_a, item_b, n_pair, cosine) with ``item_a < item_b``.
    """
    bi = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = bi.groupBy("b").agg(F.count(F.lit(1)).alias("_bn"))
    bi = bi.join(sizes.filter(F.col("_bn") <= max_basket).select("b"), "b")
    marg = bi.groupBy(F.col("i").alias("item")).agg(
        F.count(F.lit(1)).alias("_ni")
    )
    a, c = bi.alias("a"), bi.alias("c")
    pairs = (
        a.join(c, (F.col("a.b") == F.col("c.b")) & (F.col("a.i") < F.col("c.i")))
        .groupBy(F.col("a.i").alias("item_a"), F.col("c.i").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pair_support)
    )
    return (
        pairs.join(marg.select(F.col("item").alias("item_a"), F.col("_ni").alias("_na")), "item_a")
        .join(marg.select(F.col("item").alias("item_b"), F.col("_ni").alias("_nb")), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(
                F.col("n_pair") / F.sqrt(F.col("_na") * F.col("_nb")), 6
            ).alias("cosine"),
        )
    )


def attribution_credit(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    entity_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Multi-touch attribution: split each conversion's credit across the
    touchpoints that preceded it, U-shaped (40% first touch, 40% last,
    the rest linear across the middle) — the standard marketing-analytics
    position-based model, in EXACT parts-per-``scale`` integers (single
    touch gets ``scale``; two get ``scale div 2`` each; middles get the
    integer share with the remainder pinned to the first middle), so the
    per-channel totals are engine-identical — same fixed-point discipline
    as :func:`markov_transitions`.

    Journey segmentation is window-only, one shuffle on the entity key:
    a running prior-conversion count assigns every row its journey group
    (touches between conversion k−1 and k belong to k), a semi-join
    against the conversion list drops trailing touches with no following
    conversion, and rank/size windows over (entity, group) reuse the same
    partitioning.  No self-join of the fact table against itself per
    position — the k-join formulation this replaces is quadratic in
    journey length.

    Output: ``(channel, n_touches, credit_ppm_sum)`` per touch channel.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, order_col)
    is_conv = F.when(F.col("event_type") == conversion_type, 1).otherwise(0)
    seq = events.select(
        F.col(entity_col),
        F.col("event_type"),
        F.col(ts_col),
        F.col(order_col),
        F.coalesce(
            F.sum(is_conv).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("conv_before"),
    )
    convs = seq.filter(F.col("event_type") == conversion_type).select(
        F.col(entity_col), (F.col("conv_before") + 1).alias("k")
    )
    touches = seq.filter(F.col("event_type").isin(*touch_types)).select(
        F.col(entity_col),
        F.col("conv_before").alias("grp"),
        F.col("event_type").alias("channel"),
        F.col(ts_col),
        F.col(order_col),
    )
    valid = touches.join(
        convs,
        (touches[entity_col] == convs[entity_col])
        & (convs["k"] == touches["grp"] + 1),
        "leftsemi",
    )
    wg = Window.partitionBy(entity_col, "grp")
    ranked = valid.select(
        "channel",
        F.row_number().over(wg.orderBy(ts_col, order_col)).alias("r"),
        F.count(F.lit(1))
        .over(wg.orderBy(ts_col, order_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        ))
        .alias("n"),
    )
    end = 2 * scale // 5
    mid_pool = scale - 2 * end
    credit = F.expr(
        f"CASE WHEN n = 1 THEN {scale} "
        f"WHEN n = 2 THEN {scale // 2} "
        f"WHEN r = 1 OR r = n THEN {end} "
        f"ELSE {mid_pool} div (n - 2) "
        f"     + CASE WHEN r = 2 THEN {mid_pool} % (n - 2) ELSE 0 END END"
    )
    return (
        ranked.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(credit).cast("long").alias("credit_ppm_sum"),
        )
        .orderBy("channel")
    )
