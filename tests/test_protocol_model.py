"""Model-based property test for the versioned-table DML algebra.

Hypothesis drives a random SEQUENCE of protocol operations — CoW/MoR
DELETE and UPDATE (including partition-moving updates), MERGE, column
rename, compaction — against a real versioned table, while a plain
Python dict model applies the same semantics.  After EVERY commit the
snapshot read must equal the model exactly, and at the end a sampled
historical version must still read as the state the model had then.

This is the strongest net for the protocol's recurring bug class —
stale deletion-vector tuples, sequence-misapplied vectors, rename
replay on never-rewritten pieces, partition-move rewrites missing a
home — because the random interleavings compose the features in orders
no hand-written fixture enumerates.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    alter_table_columns,
    compact_versioned,
    delete_from_versioned,
    init_table,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
    update_versioned,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()

_PARTS = ["a", "b", "c"]

# one op = (kind, arg1, arg2); residues pick pseudo-random row subsets
_op = st.one_of(
    st.tuples(st.just("delete_cow"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(st.just("delete_mor"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(st.just("update_cow"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(st.just("update_mor"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(st.just("move"), st.integers(2, 5), st.sampled_from(_PARTS)),
    st.tuples(st.just("merge"), st.integers(0, 39), st.integers(1, 9)),
    st.tuples(st.just("rename"), st.just(0), st.just(0)),
    st.tuples(st.just("compact"), st.just(0), st.just(0)),
)


def _read_state(spark, root, xcol):
    rows = read_snapshot(spark, root, "p").collect()
    return {r["k"]: (r["p"], r[xcol]) for r in rows}


@settings(**_SETTINGS)
@given(st.lists(_op, min_size=3, max_size=6))
def test_random_dml_sequences_match_dict_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("proto") / "t")
    model = {k: (_PARTS[k % 3], k * 10) for k in range(40)}
    df = spark.createDataFrame(
        [(k, p, x) for k, (p, x) in model.items()], "k long, p string, x long"
    )
    init_table(spark, df, root, "p")
    xcol = "x"
    history = [(read_manifest(root)["version"], dict(model), xcol)]

    for kind, m, r in ops:
        if kind in ("delete_cow", "delete_mor"):
            cond = F.col("k") % m == r
            mode = "copy_on_write" if kind == "delete_cow" else "merge_on_read"
            delete_from_versioned(
                spark, root, "p", cond, mode=mode, key_cols=["k"]
            )
            model = {k: v for k, v in model.items() if k % m != r}
        elif kind in ("update_cow", "update_mor"):
            cond = F.col("k") % m == r
            mode = "copy_on_write" if kind == "update_cow" else "merge_on_read"
            update_versioned(
                spark, root, "p", cond, {xcol: F.col(xcol) + 7},
                mode=mode, key_cols=["k"],
            )
            model = {
                k: (p, x + 7 if k % m == r else x)
                for k, (p, x) in model.items()
            }
        elif kind == "move":
            # partition-moving update: old and new homes both rewrite
            update_versioned(
                spark, root, "p", F.col("k") % m == 0, {"p": F.lit(r)},
                key_cols=["k"],
            )
            model = {
                k: (r if k % m == 0 else p, x) for k, (p, x) in model.items()
            }
        elif kind == "merge":
            # upsert a block of keys (some existing, some new) into a
            # possibly-new partition
            keys = list(range(m, m + 12))
            part = _PARTS[(m + r) % 3]
            src = spark.createDataFrame(
                [(k, part, k * 100 + r) for k in keys],
                f"k long, p string, {xcol} long",
            )
            merge_into_versioned(spark, root, src, ["k"], "p")
            for k in keys:
                model[k] = (part, k * 100 + r)
        elif kind == "rename":
            new = "y" if xcol == "x" else "x"
            alter_table_columns(root, rename={xcol: new})
            xcol = new
        elif kind == "compact":
            if model:  # compacting an empty table has nothing to lay out
                compact_versioned(spark, root, "p", "k")
        # a fully-emptied table is still a table: it reads zero rows and
        # accepts the sequence's later merges (pinned in test_publish)
        assert _read_state(spark, root, xcol) == model, f"after {kind}"
        history.append((read_manifest(root)["version"], dict(model), xcol))

    # time travel: the midpoint version still reads as the model read then
    v_mid, m_mid, x_mid = history[len(history) // 2]
    rows = read_snapshot(spark, root, "p", version=v_mid).collect()
    got = {r["k"]: (r["p"], r[x_mid]) for r in rows}
    assert got == m_mid, f"time travel to v{v_mid} drifted"
