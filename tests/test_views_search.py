"""Edge tests: operators/views.py (mergeable rollups), llm/search.py
phrase_search, operators/analytics.py rolling_median."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake2anomali_spark.llm.search import phrase_search
from datalake2anomali_spark.operators import analytics, views

US = 1_000_000


def test_merge_states_equals_full_recompute(spark):
    df = spark.createDataFrame(
        [(d, t, float(v), i) for i, (d, t, v) in enumerate(
            [(1, "a", 1.11), (1, "a", 2.22), (1, "b", 3.0),
             (2, "a", 4.4), (2, "a", 0.01), (3, "b", 9.99)]
        )],
        "day int, typ string, value double, event_id long",
    )
    keys = ["day", "typ"]
    kw = dict(sum_cols={"value": 2}, minmax_cols=["event_id"])
    full = views.rollup_state(df, keys, **kw)
    # split three ways (uneven, one empty slice) and merge
    parts = [df.filter(F.col("event_id") % 3 == i) for i in range(3)]
    merged = views.merge_states([views.rollup_state(p, keys, **kw) for p in parts], keys)
    a = sorted(map(tuple, full.collect()))
    b = sorted(map(tuple, merged.collect()))
    assert a == b
    # exactness: 1.11 + 2.22 stored as 111 + 222 scaled-long, not floats
    row = {(r.day, r.typ): r for r in merged.collect()}[(1, "a")]
    assert (row.n_rows, row.sum_value) == (2, 333)


def test_merge_states_is_reentrant(spark):
    # merging merged states must be legal (view-of-views): same schema roles
    df = spark.createDataFrame([(1, 1.0, 1), (1, 2.0, 2)], "k int, value double, event_id long")
    s = views.rollup_state(df, ["k"], sum_cols={"value": 2}, minmax_cols=["event_id"])
    twice = views.merge_states([views.merge_states([s], ["k"]), s], ["k"])
    row = twice.collect()[0]
    assert (row.n_rows, row.sum_value, row.min_event_id) == (4, 600, 1)


def test_merge_states_rejects_unmergeable_columns(spark):
    df = spark.createDataFrame([(1, 2.0)], "k int, avg_value double")
    with pytest.raises(ValueError, match="merge op"):
        views.merge_states([df], ["k"])


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")


def test_phrase_search_counts_and_three_term_chain(spark):
    docs = _docs(
        spark,
        [
            "a b c a b c a b",  # "a b c" twice, "a b" three times
            "b c a",  # contains no "a b"
            "a b",  # exactly once, at end
            "x a b y a b",  # twice
        ],
    )
    two = {r.doc_id: r.n_matches for r in phrase_search(docs, "a b").collect()}
    assert two == {0: 3, 2: 1, 3: 2}
    three = {r.doc_id: r.n_matches for r in phrase_search(docs, "a b c").collect()}
    assert three == {0: 2}


def test_phrase_search_repeated_token_overlaps(spark):
    # overlapping occurrences of a self-overlapping phrase all count:
    # "a a a" contains "a a" starting at positions 0 and 1
    docs = _docs(spark, ["a a a"])
    out = phrase_search(docs, "a a").collect()
    assert out[0].n_matches == 2


def test_phrase_search_rejects_malformed(spark):
    docs = _docs(spark, ["x"])
    with pytest.raises(ValueError, match="malformed"):
        phrase_search(docs, "a  b")  # empty token from double space


def test_rolling_median_orderstats_and_parity(spark):
    rows = [(i, 1, i * US, "view", float(v)) for i, v in enumerate([5, 1, 9, 3, 7], 1)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    out = {r.event_id: r.median_scaled for r in analytics.rolling_median(ev, depth=9).collect()}
    assert out[1] == 5000  # [5]
    assert out[2] == 3000  # [1,5] → (1000+5000)>>1
    assert out[3] == 5000  # [1,5,9]
    assert out[4] == 4000  # [1,3,5,9] → (3000+5000)>>1
    assert out[5] == 5000  # [1,3,5,7,9]


def test_rolling_median_depth_eviction(spark):
    # depth=3: the 4th event's window drops the first value
    rows = [(1, 1, 1 * US, "v", 100.0), (2, 1, 2 * US, "v", 1.0),
            (3, 1, 3 * US, "v", 2.0), (4, 1, 4 * US, "v", 3.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_us long, event_type string, value double"
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us"))).drop("ts_us")
    out = {r.event_id: r.median_scaled for r in analytics.rolling_median(ev, depth=3).collect()}
    assert out[3] == 2000  # [100,1,2] → median 2
    assert out[4] == 2000  # [1,2,3] → 100 evicted


def test_json_flatten_udtf_nested_paths(spark):
    from datalake2anomali_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [
            (1, '{"a": {"b": [1, {"c": true}]}, "d": null}'),
            (2, "not json"),  # corrupt → zero rows
            (3, None),  # null → zero rows
            (4, '{"s": "x"}'),
        ],
        "id long, js string",
    ).createOrReplaceTempView("jf_src")
    rows = spark.sql(
        "SELECT s.id, f.path, f.leaf FROM jf_src s, LATERAL json_flatten(s.js) f"
    ).collect()
    got = {(r.id, r.path): r.leaf for r in rows}
    assert got == {
        (1, "$.a.b[0]"): "1",
        (1, "$.a.b[1].c"): "true",
        (1, "$.d"): "null",
        (4, "$.s"): '"x"',  # strings stay JSON-quoted (json_extract contract)
    }


def test_apply_changes_equals_full_recompute(spark, sf_dir, tmp_path):
    """CDC-driven view maintenance: retract pre-images, add post-images,
    recompute extrema only for touched groups — the refreshed view must
    be bit-identical to rollup_state over the post-change table, across
    updates (incl. NULL-ing and group moves), inserts, and deletes."""
    from pyspark.sql import functions as F

    from datalake2anomali_spark.io.publish import (
        delete_from_versioned,
        init_table,
        merge_into_versioned,
        read_snapshot,
        table_changes,
    )
    from datalake2anomali_spark.io.tables import load_table
    from datalake2anomali_spark.operators.views import apply_changes, rollup_state

    root = str(tmp_path / "cdc_view")
    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    init_table(spark, e, root, "event_date")
    keys = ["event_date", "event_type"]
    view = rollup_state(
        read_snapshot(spark, root, "event_date"),
        keys,
        sum_cols={"value": 2},
        minmax_cols=["event_id"],
    ).localCheckpoint(eager=True)

    snap0 = read_snapshot(spark, root, "event_date")
    upd = snap0.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") + 50.0
    )
    nul = (
        snap0.filter((F.col("event_type") == "purchase") & (F.col("event_id") % 3 == 0))
        .withColumn("value", F.lit(None).cast("double"))
    )
    mov = (
        snap0.filter(F.col("event_type") == "signup")
        .limit(20)
        .withColumn("event_date", F.lit("2033-05-05"))
    )
    ins = snap0.limit(7).withColumn("event_id", F.col("event_id") + 90_000_000)
    v2 = merge_into_versioned(
        spark, root,
        upd.unionByName(nul).unionByName(mov).unionByName(ins),
        ["event_id"], "event_date",
    )
    v3 = delete_from_versioned(
        spark, root, "event_date", F.col("event_type") == "error"
    )

    cdf = table_changes(
        spark, root, "event_date", ["event_id"], 1, v3, include_images=True
    )
    new_snap = read_snapshot(spark, root, "event_date")
    got = apply_changes(
        view, cdf, ["event_id"], keys,
        sum_cols={"value": 2}, minmax_cols=["event_id"],
        new_snapshot=new_snap,
    )
    want = rollup_state(
        new_snap, keys, sum_cols={"value": 2}, minmax_cols=["event_id"]
    )
    cols = sorted(want.columns)
    assert got.count() == want.count()
    assert (
        got.select(*cols).exceptAll(want.select(*cols)).count() == 0
        and want.select(*cols).exceptAll(got.select(*cols)).count() == 0
    )


def test_apply_changes_requires_snapshot_for_minmax(spark):
    from datalake2anomali_spark.operators.views import apply_changes

    with pytest.raises(ValueError, match="min/max"):
        apply_changes(None, None, ["k"], ["g"], {}, minmax_cols=["x"])
