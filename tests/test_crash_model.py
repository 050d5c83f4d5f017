"""Crash-injection model test for the versioned-table commit protocol.

Hypothesis drives random MERGE / UPDATE (CoW and MoR) sequences where a
random subset of the commits CRASH at the injection point — after the
data write, immediately before the manifest swap (the worst instant:
bytes are on disk, the pointer is not).  The invariants, checked after
every attempt: a crashed commit leaves the table reading EXACTLY the
pre-crash model (the orphan directory is invisible and vacuumable), and
the immediate retry of the same operation lands cleanly on the next
version.  This randomizes the crash x feature grid (crash during a
MoR-update's vector+append commit, crash after a stack of live vectors,
crash then vacuum then retry) that the targeted crash tests cover only
pointwise.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    delete_from_versioned,
    init_table,
    merge_into_versioned,
    read_snapshot,
    update_versioned,
    vacuum,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()


class _Boom(RuntimeError):
    pass


def _crash():
    raise _Boom("injected crash between data write and manifest swap")


_op = st.tuples(
    st.sampled_from(
        ["merge", "update_cow", "update_mor", "delete_cow", "delete_mor"]
    ),
    st.integers(1, 9),  # seed
    # clean commit, crash-then-retry, or crash-vacuum-then-retry — a
    # three-way mode instead of two booleans so no generated value is
    # dead weight in the clean half of the space
    st.sampled_from(["clean", "crash", "crash_vacuum"]),
)


def _state(spark, root):
    rows = read_snapshot(spark, root, "p").collect()
    return {r["k"]: (r["p"], r["x"]) for r in rows}


@settings(**_SETTINGS)
@given(st.lists(_op, min_size=2, max_size=5))
def test_crashed_commits_leave_no_trace_and_retry_lands(
    spark, tmp_path_factory, ops
):
    root = str(tmp_path_factory.mktemp("crash") / "t")
    model = {k: (str(k % 3), k * 10) for k in range(30)}
    df = spark.createDataFrame(
        [(k, p, x) for k, (p, x) in model.items()], "k long, p string, x long"
    )
    init_table(spark, df, root, "p")

    for kind, seed, mode_tag in ops:
        def run(hook=None):
            """Apply the op; return (upserts, deleted_keys) for the model."""
            if kind == "merge":
                keys = list(range(2000 + seed * 10, 2000 + seed * 10 + 6))
                src = spark.createDataFrame(
                    [(k, str(k % 3), k + seed) for k in keys],
                    "k long, p string, x long",
                )
                merge_into_versioned(
                    spark, root, src, ["k"], "p", commit_hook=hook
                )
                return {k: (str(k % 3), k + seed) for k in keys}, []
            mode = "merge_on_read" if kind.endswith("_mor") else "copy_on_write"
            if kind.startswith("delete"):
                delete_from_versioned(
                    spark, root, "p", F.col("k") % 4 == seed % 4,
                    mode=mode, key_cols=["k"], commit_hook=hook,
                )
                return {}, [k for k in model if k % 4 == seed % 4]
            update_versioned(
                spark, root, "p", F.col("k") % 3 == seed % 3,
                {"x": F.col("x") + 5}, mode=mode, key_cols=["k"],
                commit_hook=hook,
            )
            return {
                k: (p, x + 5)
                for k, (p, x) in model.items()
                if k % 3 == seed % 3
            }, []

        # will this op commit at all?  A predicate matching NOTHING is a
        # documented engine no-op — it returns before the injection
        # point, so the "crash" cannot fire (found by the 25-example
        # soak: delete the same residue twice, second is empty)
        will_commit = kind == "merge" or (
            any(k % 4 == seed % 4 for k in model)
            if kind.startswith("delete")
            else any(k % 3 == seed % 3 for k in model)
        )
        if mode_tag != "clean":
            if will_commit:
                try:
                    run(hook=_crash)
                    raise AssertionError("injected crash did not propagate")
                except _Boom:
                    pass
            else:
                run(hook=_crash)  # engine no-ops before the hook
            # the table reads exactly the pre-crash state
            assert _state(spark, root) == model, f"crashed {kind} left a trace"
            if mode_tag == "crash_vacuum":
                # reclaim the orphan; the read must still be the model
                vacuum(root, retain_last=1, claim_ttl_seconds=0.0)
                assert _state(spark, root) == model, "vacuum after crash drifted"
        upserts, deleted = run()
        model.update(upserts)
        for k in deleted:
            model.pop(k, None)
        assert _state(spark, root) == model, f"retry of {kind} did not land"
