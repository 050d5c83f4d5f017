"""Hidden partitioning (io/hidden.py): transform-derived pruning must
actually skip partitions, never change results, and survive the merge
path of the underlying versioned table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.io.hidden import (
    HIDDEN_COL,
    bucket_of,
    init_hidden_table,
    may_match,
    read_hidden,
    read_spec,
)
from datalake2anomali_spark.io.publish import read_manifest
from datalake2anomali_spark.io.tables import load_table


def _pruned_set(root, predicate):
    spec = read_spec(root)
    m = read_manifest(root)
    return [p for p in m["partitions"] if may_match(spec, p, predicate)]


def test_days_transform_prunes_and_is_exact(spark, sf_dir, tmp_path):
    root = str(tmp_path / "h_days")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])

    b = e.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    span = b[1] - b[0]
    lo, hi = b[0] + span * 2 // 5, b[0] + span * 3 // 5
    pred = ("between", "ts", lo, hi)

    m = read_manifest(root)
    scanned = _pruned_set(root, pred)
    assert 0 < len(scanned) < len(m["partitions"])  # pruning is real

    got = read_hidden(spark, root, predicate=pred)
    assert HIDDEN_COL not in got.columns  # layout never leaks
    want = e.filter(
        (F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi)
    )
    assert got.count() == want.count()
    cols = sorted(want.columns)
    assert (
        got.select(*cols).exceptAll(want.select(*cols)).count() == 0
        and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    )


def test_bucket_transform_point_lookup(spark, sf_dir, tmp_path):
    root = str(tmp_path / "h_bucket")
    e = load_table(spark, sf_dir, "events")
    n = 8
    init_hidden_table(spark, e, root, ["bucket", n, "user_id"])
    m = read_manifest(root)
    assert len(m["partitions"]) <= n

    probe = int(e.agg(F.max("user_id")).collect()[0][0])
    pred = ("eq", "user_id", probe)
    scanned = _pruned_set(root, pred)
    assert scanned == [str(bucket_of(probe, n))]  # exactly one bucket

    got = read_hidden(spark, root, predicate=pred)
    want = e.filter(F.col("user_id") == probe)
    assert got.count() == want.count() > 0

    # a range predicate cannot prune buckets, but stays correct
    rng = read_hidden(spark, root, predicate=("between", "user_id", 0, probe))
    assert rng.count() == e.filter(F.col("user_id").between(0, probe)).count()


def test_truncate_transform_range(spark, sf_dir, tmp_path):
    root = str(tmp_path / "h_trunc")
    e = load_table(spark, sf_dir, "events")
    w = 200
    init_hidden_table(spark, e, root, ["truncate", w, "event_id"])
    b = e.agg(F.min("event_id"), F.max("event_id")).collect()[0]
    lo = int(b[0]) + (int(b[1]) - int(b[0])) * 2 // 5
    hi = lo + 3 * w
    pred = ("between", "event_id", lo, hi)

    m = read_manifest(root)
    scanned = _pruned_set(root, pred)
    assert 0 < len(scanned) <= 4 < len(m["partitions"])

    got = read_hidden(spark, root, predicate=pred)
    assert got.count() == e.filter(F.col("event_id").between(lo, hi)).count()


def test_predicate_on_other_column_falls_back_unpruned(spark, sf_dir, tmp_path):
    root = str(tmp_path / "h_other")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])
    pred = ("eq", "event_type", "click")
    assert len(_pruned_set(root, pred)) == len(read_manifest(root)["partitions"])
    got = read_hidden(spark, root, predicate=pred)
    assert got.count() == e.filter(F.col("event_type") == "click").count()


def test_unknown_transform_rejected(spark, sf_dir, tmp_path):
    from datalake2anomali_spark.io.hidden import transform_column

    with pytest.raises(ValueError, match="unknown partition transform"):
        transform_column(["months", "ts"])


def test_hidden_dml_merge_and_delete(spark, sf_dir, tmp_path):
    """MERGE/DELETE on a hidden table never require the caller to touch
    the layout column: updates that move a row's day relocate it, the
    pruned read still finds it at its new home, and a source-column
    DELETE removes exactly its rows."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.hidden import (
        delete_from_hidden,
        merge_into_hidden,
    )

    root = str(tmp_path / "h_dml")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])
    n0 = e.count()

    # move 5 rows 40 days forward (changes their hidden day partition)
    mov = e.limit(5).withColumn("ts", F.col("ts") + F.expr("INTERVAL 40 DAYS"))
    ids = [r.event_id for r in mov.select("event_id").collect()]
    merge_into_hidden(spark, root, mov, ["event_id"])

    snap = read_hidden(spark, root)
    assert snap.count() == n0  # moved, not duplicated
    moved_ts = [
        r.ts for r in snap.filter(F.col("event_id").isin(ids)).collect()
    ]
    assert len(moved_ts) == 5

    # a pruned read around the NEW location finds the movers
    lo = int(
        mov.agg(F.min(F.unix_micros("ts"))).collect()[0][0]
    )
    hi = int(mov.agg(F.max(F.unix_micros("ts"))).collect()[0][0])
    got = read_hidden(spark, root, predicate=("between", "ts", lo, hi))
    assert got.filter(F.col("event_id").isin(ids)).count() == 5

    delete_from_hidden(spark, root, F.col("event_id").isin(ids))
    assert read_hidden(spark, root).count() == n0 - 5


def test_unsafe_transform_source_types_rejected(spark, tmp_path):
    """ADVICE r7: a bucket over a boolean/double/timestamp column renders
    differently in the Spark writer expression vs the pure-Python reader
    probe ('True' vs 'true'), so may_match would definitively reject the
    correct partition and silently drop rows — refused at init."""
    df = spark.createDataFrame(
        [(1, True, 2.5)], "k long, flag boolean, x double"
    )
    with pytest.raises(ValueError, match="unsupported"):
        init_hidden_table(
            spark, df, str(tmp_path / "h_bool"), ["bucket", 4, "flag"]
        )
    with pytest.raises(ValueError, match="unsupported"):
        init_hidden_table(
            spark, df, str(tmp_path / "h_dbl"), ["bucket", 4, "x"]
        )
    with pytest.raises(ValueError, match="unsupported"):
        init_hidden_table(
            spark, df, str(tmp_path / "h_trunc"), ["truncate", 10, "x"]
        )
    with pytest.raises(ValueError, match="not in dataframe"):
        init_hidden_table(
            spark, df, str(tmp_path / "h_missing"), ["bucket", 4, "nope"]
        )
    # integral source still accepted
    init_hidden_table(spark, df, str(tmp_path / "h_ok"), ["bucket", 4, "k"])
    assert read_hidden(spark, str(tmp_path / "h_ok")).count() == 1


def test_partition_spec_evolution_end_to_end(spark, sf_dir, tmp_path):
    """Evolve days(ts) -> bucket(user_id) metadata-only: old partitions
    keep pruning under days, new writes land (prefixed) under bucket and
    prune on user_id; both reads stay exact vs a direct source filter."""
    from datalake2anomali_spark.io.hidden import (
        evolve_partition_spec,
        may_match_multi,
        merge_into_hidden,
        _load_generations,
    )

    root = str(tmp_path / "h_evolve")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])
    n_days = len(read_manifest(root)["partitions"])

    gen = evolve_partition_spec(root, ["bucket", 8, "user_id"])
    assert gen == 1
    assert read_spec(root) == ["bucket", 8, "user_id"]  # current spec
    assert _load_generations(root) == [["days", "ts"], ["bucket", 8, "user_id"]]

    # new rows (fresh keys) land under the NEW layout, prefixed g1:
    ins = e.filter(F.col("event_type") == "error").withColumn(
        "event_id", F.col("event_id") + 60_000_000
    )
    merge_into_hidden(spark, root, ins, ["event_id"])
    parts = list(read_manifest(root)["partitions"])
    g1 = [p for p in parts if p.startswith("g1:")]
    g0 = [p for p in parts if not p.startswith("g1:")]
    assert g1 and len(g0) == n_days  # old layout untouched

    gens = _load_generations(root)
    full = e.unionByName(ins)

    # ts window: prunes gen-0 day partitions, conservatively keeps all g1
    b = e.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).collect()[0]
    span = b[1] - b[0]
    lo, hi = b[0] + span * 2 // 5, b[0] + span * 3 // 5
    tpred = ("between", "ts", lo, hi)
    kept = [p for p in parts if may_match_multi(gens, p, tpred)]
    assert set(g1) <= set(kept) and len(kept) < len(parts)
    got = read_hidden(spark, root, predicate=tpred)
    want = full.filter((F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi))
    cols = sorted(want.columns)
    assert got.count() == want.count()
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0

    # user_id point lookup: prunes g1 buckets to one, keeps all gen-0 days
    uid = e.select("user_id").first()[0]
    upred = ("eq", "user_id", uid)
    keptu = [p for p in parts if may_match_multi(gens, p, upred)]
    assert len([p for p in keptu if p.startswith("g1:")]) == 1
    assert set(g0) <= set(keptu)
    gotu = read_hidden(spark, root, predicate=upred)
    wantu = full.filter(F.col("user_id") == uid)
    assert gotu.count() == wantu.count()
    assert gotu.select(*cols).exceptAll(wantu.select(*cols)).count() == 0


def test_evolution_validates_source_type_from_manifest_schema(
    spark, sf_dir, tmp_path
):
    from datalake2anomali_spark.io.hidden import evolve_partition_spec

    root = str(tmp_path / "h_evolve_bad")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])
    with pytest.raises(ValueError, match="unsupported"):
        evolve_partition_spec(root, ["bucket", 8, "value"])  # double source
    with pytest.raises(ValueError, match="not in dataframe"):
        evolve_partition_spec(root, ["bucket", 8, "no_such_col"])


def test_rewritten_rows_relocate_to_current_generation(spark, sf_dir, tmp_path):
    """A merge UPDATE after evolution moves the touched rows to the new
    layout (partition-move path); untouched rows stay in their old homes."""
    from datalake2anomali_spark.io.hidden import (
        evolve_partition_spec,
        merge_into_hidden,
    )

    root = str(tmp_path / "h_evolve_move")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, ["days", "ts"])
    evolve_partition_spec(root, ["truncate", 1000, "event_id"])

    upd = e.filter(F.col("event_type") == "purchase").withColumn(
        "value", F.col("value") + 5.0
    )
    merge_into_hidden(spark, root, upd, ["event_id"])
    snap = read_hidden(spark, root)
    assert snap.count() == e.count()  # pure update, no dupes
    # updated rows now live under g1: truncate buckets
    m = read_manifest(root)
    assert any(p.startswith("g1:") for p in m["partitions"])
    got = snap.filter(F.col("event_type") == "purchase").agg(
        F.sum(F.round(F.col("value") * 100)).cast("long").alias("s")
    ).collect()[0]["s"]
    want = upd.agg(
        F.sum(F.round(F.col("value") * 100)).cast("long").alias("s")
    ).collect()[0]["s"]
    assert got == want


def test_mixed_time_and_bucket_generations_on_same_column_stay_exact(
    spark, sf_dir, tmp_path
):
    """days(d) evolved to bucket(d) over the SAME date column: the
    epoch-us predicate a time generation forces cannot address bucket
    partitions, so they must be conservatively read — not definitively
    (and wrongly) rejected."""
    from datalake2anomali_spark.io.hidden import (
        evolve_partition_spec,
        merge_into_hidden,
        may_match_multi,
        _load_generations,
    )

    root = str(tmp_path / "h_mixed_units")
    e = load_table(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))
    init_hidden_table(spark, e, root, ["days", "d"])
    evolve_partition_spec(root, ["bucket", 4, "d"])
    ins = e.filter(F.col("event_type") == "error").withColumn(
        "event_id", F.col("event_id") + 70_000_000
    )
    merge_into_hidden(spark, root, ins, ["event_id"])

    gens = _load_generations(root)
    parts = list(read_manifest(root)["partitions"])
    g1 = [p for p in parts if p.startswith("g1:")]
    assert g1  # new layout active
    # probe one concrete day (epoch-us per the time-transform contract)
    lo = e.agg(F.min(F.unix_micros(F.col("d").cast("timestamp")))).collect()[0][0]
    pred = ("eq", "d", lo)
    kept = [p for p in parts if may_match_multi(gens, p, pred)]
    assert set(g1) <= set(kept)  # bucket partitions conservatively read
    got = read_hidden(spark, root, predicate=pred)
    full = e.unionByName(ins)
    want = full.filter(
        F.unix_micros(F.col("d").cast("timestamp")) == F.lit(lo)
    )
    cols = sorted(want.columns)
    assert got.count() == want.count() and want.count() > 0
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0


def test_multi_transform_spec_prunes_on_either_column(spark, sf_dir, tmp_path):
    """days(ts) + bucket(user_id) composite spec: a ts window prunes the
    day component, a user_id point lookup prunes the bucket component,
    and both reads equal a direct source filter."""
    from datalake2anomali_spark.io.hidden import may_match, read_spec

    root = str(tmp_path / "h_multi")
    e = load_table(spark, sf_dir, "events")
    n_buckets = 4
    init_hidden_table(
        spark, e, root, [["days", "ts"], ["bucket", n_buckets, "user_id"]]
    )
    m = read_manifest(root)
    parts = list(m["partitions"])
    assert all(p.count("|") == 1 for p in parts)  # composite values
    n_days = len({p.split("|")[0] for p in parts})
    spec = read_spec(root)

    # ts window → day component prunes, every bucket of a kept day reads
    b = e.agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))).collect()[0]
    span = b[1] - b[0]
    lo, hi = b[0] + span * 2 // 5, b[0] + span * 3 // 5
    tpred = ("between", "ts", lo, hi)
    kept_t = [p for p in parts if may_match(spec, p, tpred)]
    assert 0 < len(kept_t) < len(parts)
    got = read_hidden(spark, root, predicate=tpred)
    want = e.filter((F.unix_micros("ts") >= lo) & (F.unix_micros("ts") <= hi))
    cols = sorted(want.columns)
    assert got.count() == want.count()
    assert got.select(*cols).exceptAll(want.select(*cols)).count() == 0

    # user point lookup → bucket component prunes to ~1/n_buckets
    uid = e.select("user_id").first()[0]
    upred = ("eq", "user_id", uid)
    kept_u = [p for p in parts if may_match(spec, p, upred)]
    assert len(kept_u) <= n_days  # one bucket per day at most
    gotu = read_hidden(spark, root, predicate=upred)
    wantu = e.filter(F.col("user_id") == uid)
    assert gotu.count() == wantu.count() and wantu.count() > 0
    assert gotu.select(*cols).exceptAll(wantu.select(*cols)).count() == 0


def test_multi_spec_dml_and_validation(spark, sf_dir, tmp_path):
    from datalake2anomali_spark.io.hidden import merge_into_hidden

    root = str(tmp_path / "h_multi_dml")
    e = load_table(spark, sf_dir, "events")
    init_hidden_table(spark, e, root, [["days", "ts"], ["bucket", 4, "user_id"]])
    upd = e.filter(F.col("event_type") == "purchase").withColumn(
        "value", F.col("value") + 2.0
    )
    merge_into_hidden(spark, root, upd, ["event_id"])
    snap = read_hidden(spark, root)
    assert snap.count() == e.count()
    got = snap.agg(F.sum(F.round(F.col("value") * 100)).cast("long")).collect()[0][0]
    want = e.withColumn(
        "value",
        F.when(F.col("event_type") == "purchase", F.col("value") + 2.0).otherwise(
            F.col("value")
        ),
    ).agg(F.sum(F.round(F.col("value") * 100)).cast("long")).collect()[0][0]
    assert got == want
    # per-component validation still fires inside a composite spec
    with pytest.raises(ValueError, match="unsupported"):
        init_hidden_table(
            spark, e, str(tmp_path / "h_multi_bad"),
            [["days", "ts"], ["bucket", 4, "value"]],
        )
