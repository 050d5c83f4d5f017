"""Model-based property test for the hidden-partitioning algebra.

Hypothesis interleaves MERGE / DELETE / partition-spec EVOLUTION over a
hidden table while a dict model applies the same row semantics (a spec
evolution is layout-only and must never change results).  After every
commit the full read AND two transform-pruned reads (a time-window
``between`` on the days() source and an ``eq`` point lookup on the
bucket() source) must equal the model's filter — across mixed
generations, where each partition prunes under the transform that wrote
it."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io.hidden import (
    delete_from_hidden,
    evolve_partition_spec,
    init_hidden_table,
    merge_into_hidden,
    read_hidden,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()

_DAY_US = 86_400_000_000
_BASE_US = 1_700_000_000_000_000  # fixed epoch anchor (UTC)

_op = st.one_of(
    st.tuples(st.just("merge"), st.integers(0, 30), st.integers(1, 9)),
    st.tuples(st.just("delete"), st.integers(2, 4), st.integers(0, 3)),
    st.tuples(st.just("evolve"), st.integers(0, 1), st.just(0)),
)

_SPECS = [
    [["bucket", 4, "user_id"]],
    [["days", "ts"], ["bucket", 4, "user_id"]],
]


def _row(k: int, seed: int):
    return (k, _BASE_US + (k % 5) * _DAY_US + seed * 3_600_000_000,
            k % 10, k * 10 + seed)


def _df(spark, rows):
    df = spark.createDataFrame(
        list(rows), "k long, ts_us long, user_id long, x long"
    )
    return df.select(
        "k", F.timestamp_micros(F.col("ts_us")).alias("ts"), "user_id", "x"
    )


def _state(spark, root, predicate=None):
    rows = read_hidden(spark, root, predicate=predicate).collect()
    return {
        r["k"]: (int(r["ts"].timestamp() * 1_000_000), r["user_id"], r["x"])
        for r in rows
    }


@settings(**_SETTINGS)
@given(st.lists(_op, min_size=2, max_size=5))
def test_hidden_interleavings_match_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("hidden") / "t")
    model = {k: _row(k, 0)[1:] for k in range(40)}  # k -> (ts_us, uid, x)
    init_hidden_table(
        spark, _df(spark, [(k, *v) for k, v in model.items()]),
        root, ["days", "ts"],
    )

    def check():
        assert _state(spark, root) == model, "full read drifted"
        lo, hi = _BASE_US + 1 * _DAY_US, _BASE_US + 3 * _DAY_US
        want = {k: v for k, v in model.items() if lo <= v[0] <= hi}
        got = _state(spark, root, predicate=("between", "ts", lo, hi))
        assert got == want, "time-pruned read drifted"
        want_u = {k: v for k, v in model.items() if v[1] == 3}
        got_u = _state(spark, root, predicate=("eq", "user_id", 3))
        assert got_u == want_u, "bucket-pruned read drifted"

    check()
    for kind, a, b in ops:
        if kind == "merge":
            rows = [(k, *_row(k, b)[1:]) for k in range(a, a + 10)]
            merge_into_hidden(spark, root, _df(spark, rows), ["k"])
            for k, *v in rows:
                model[k] = tuple(v)
        elif kind == "delete":
            delete_from_hidden(spark, root, F.col("user_id") % a == b)
            model = {k: v for k, v in model.items() if v[1] % a != b}
        else:
            evolve_partition_spec(root, _SPECS[a])
        # an emptied table reads zero rows (full and pruned) and accepts
        # the sequence's later merges
        check()
