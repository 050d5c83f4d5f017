"""Crash-injection nets over the newly certified surfaces (VERDICT r11
task 6, carried from r10): CatalogTransaction mid-CAS, merge_branch
mid-assembly, alter_table_columns mid-log-append, and value-index
refresh mid-apply — the class the r10 ADVICE high finding (index
bricking on crash replay) came from, which the driver found and the
old nets could not reach because their alphabet stopped at single-table
MERGE/UPDATE/DELETE.

Each test is hypothesis-driven over randomized op sequences with the
crash drawn per step.  Injection points are the real seams: the catalog
pointer swap (``_swap_catalog``), the table manifest CAS
(``_commit_checked``), and the follower cursor commit
(``TableFollower.commit``) — always AFTER durable side effects, the
worst instant.  Soak knob: ``SPARK_GRAFT_HYP_EXAMPLES=25 pytest
tests/test_crash_model_extended.py``.
"""

from __future__ import annotations

import os
from unittest import mock

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io import catalog as catmod
from datalake2anomali_spark.io import publish as pubmod
from datalake2anomali_spark.io.catalog import (
    MultiTableTransaction,
    catalog_manifest,
    catalog_read,
    catalog_register,
    create_catalog,
)
from datalake2anomali_spark.io.index import (
    create_value_index,
    index_lookup_partitions,
    refresh_value_index,
)
from datalake2anomali_spark.io.publish import (
    alter_table_columns,
    create_branch,
    delete_from_versioned,
    init_table,
    merge_branch,
    merge_into_versioned,
    read_manifest,
    read_snapshot,
    restore_version,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()


class _Boom(RuntimeError):
    pass


def _boom(*_a, **_k):
    raise _Boom("injected crash")


def _mk(spark, rows, schema="k long, p string, x long"):
    return spark.createDataFrame(rows, schema)


def _state(spark, root, pcol="p"):
    return {
        r["k"]: (r[pcol], r["x"])
        for r in read_snapshot(spark, root, pcol).collect()
    }


# ---------------------------------------------------------------------------
# 1. MultiTableTransaction: crash between member commits and the catalog CAS
# ---------------------------------------------------------------------------

_txn_step = st.tuples(
    st.integers(1, 9),                     # seed
    st.booleans(),                         # include a totals merge too?
    st.sampled_from(["clean", "crash_cas"]),
)


@settings(**_SETTINGS)
@given(st.lists(_txn_step, min_size=1, max_size=3))
def test_catalog_txn_crash_mid_cas_then_documented_recovery(
    spark, tmp_path_factory, steps
):
    """A crash AFTER phase-2 member commits but BEFORE the catalog CAS
    leaves the catalog view exactly at the pre-transaction snapshot for
    EVERY member (no torn batch), and the documented recovery —
    restore members to their pins, re-pin, re-stage the full batch —
    lands the batch exactly once."""
    base = tmp_path_factory.mktemp("ctxn")
    croot, a_root, b_root = str(base / "cat"), str(base / "a"), str(base / "b")
    a_model = {k: (str(k % 3), k * 10) for k in range(18)}
    b_model = {k: (str(k % 2), 1) for k in range(6)}
    init_table(spark, _mk(spark, [(k, p, x) for k, (p, x) in a_model.items()]),
               a_root, "p")
    init_table(spark, _mk(spark, [(k, p, x) for k, (p, x) in b_model.items()]),
               b_root, "p")
    create_catalog(croot)
    catalog_register(croot, "a", a_root)
    catalog_register(croot, "b", b_root)

    def cat_state(name, pcol="p"):
        return {
            r["k"]: (r[pcol], r["x"])
            for r in catalog_read(spark, croot, name, pcol).collect()
        }

    for seed, touch_b, mode in steps:
        a_up = {
            k: (p, x + seed) for k, (p, x) in a_model.items() if k % 3 == seed % 3
        }
        b_up = {100 + seed: (str(seed % 2), seed)} if touch_b else {}

        def stage():
            mtxn = MultiTableTransaction(spark, croot, {"a": "p", "b": "p"})
            mtxn.table("a").update(
                F.col("k") % 3 == seed % 3, {"x": F.col("x") + seed}
            )
            if touch_b:
                mtxn.table("b").merge(
                    _mk(spark, [(k, p, x) for k, (p, x) in b_up.items()]),
                    ["k"],
                )
            return mtxn

        if mode == "crash_cas":
            cat_v0 = catalog_manifest(croot)["version"]
            pins = {
                n: catalog_manifest(croot)["tables"][n]["version"]
                for n in ("a", "b")
            }
            mtxn = stage()
            with mock.patch.object(catmod, "_swap_catalog", _boom):
                try:
                    mtxn.commit()
                    raise AssertionError("crash did not propagate")
                except _Boom:
                    pass
            # catalog view untouched on BOTH members (no torn batch)
            assert catalog_manifest(croot)["version"] == cat_v0
            assert cat_state("a") == a_model
            assert cat_state("b") == b_model
            # member heads durably advanced past their pins — a naive
            # retry must refuse at BEGIN
            assert read_manifest(a_root)["version"] > pins["a"]
            try:
                MultiTableTransaction(spark, croot, {"a": "p", "b": "p"})
                raise AssertionError("BEGIN accepted a head past its pin")
            except pubmod.ConcurrentWriteError:
                pass
            # documented recovery: restore every member to its pin
            # content, re-pin, re-stage the FULL batch
            for name, root in (("a", a_root), ("b", b_root)):
                restore_version(root, pins[name])
                catalog_register(croot, name, root)
            assert cat_state("a") == a_model
            assert cat_state("b") == b_model

        stage().commit()
        a_model.update(a_up)
        b_model.update(b_up)
        assert cat_state("a") == a_model, "batch did not land exactly once"
        assert cat_state("b") == b_model


# ---------------------------------------------------------------------------
# 2. merge_branch: crash mid-assembly, before the main-manifest CAS
# ---------------------------------------------------------------------------

@settings(**_SETTINGS)
@given(
    branch_parts=st.sets(st.integers(0, 5), min_size=1, max_size=2),
    main_parts=st.sets(st.integers(0, 5), min_size=0, max_size=2),
    seed=st.integers(1, 9),
)
def test_merge_branch_crash_mid_assembly(
    spark, tmp_path_factory, branch_parts, main_parts, seed
):
    """merge_branch assembles the merged manifest, then crashes at the
    CAS: main and the branch both read exactly their pre-merge states
    (the claimed version is invisible orphan debris), and the retry
    publishes the disjoint union."""
    main_parts = main_parts - branch_parts  # conflict-free by construction
    root = str(tmp_path_factory.mktemp("mb") / "t")
    model = {k: (str(k % 6), k * 10) for k in range(36)}
    init_table(
        spark, _mk(spark, [(k, p, x) for k, (p, x) in model.items()]), root, "p"
    )
    create_branch(root, "wip")

    b_rows = {
        1000 + p: (str(p), seed) for p in branch_parts
    }
    m_rows = {
        2000 + p: (str(p), seed + 1) for p in main_parts
    }
    merge_into_versioned(
        spark, root, _mk(spark, [(k, p, x) for k, (p, x) in b_rows.items()]),
        ["k"], "p", ref="wip",
    )
    if m_rows:
        merge_into_versioned(
            spark, root, _mk(spark, [(k, p, x) for k, (p, x) in m_rows.items()]),
            ["k"], "p",
        )
    main_model = {**model, **m_rows}
    main_m0 = read_manifest(root)
    branch_m0 = read_manifest(root, ref="wip")

    with mock.patch.object(pubmod, "_commit_checked", _boom):
        try:
            merge_branch(root, "wip")
            raise AssertionError("crash did not propagate")
        except _Boom:
            pass
    assert read_manifest(root) == main_m0, "crashed merge moved main"
    assert read_manifest(root, ref="wip") == branch_m0, "crashed merge moved branch"
    assert _state(spark, root) == main_model

    merge_branch(root, "wip")
    assert _state(spark, root) == {**model, **m_rows, **b_rows}


# ---------------------------------------------------------------------------
# 3. alter_table_columns: crash mid-log-append (before the schema commit CAS)
# ---------------------------------------------------------------------------

_alter_step = st.tuples(
    st.sampled_from(["add", "rename", "rename_back", "drop_added"]),
    st.sampled_from(["clean", "crash"]),
)


@settings(**_SETTINGS)
@given(st.lists(_alter_step, min_size=1, max_size=4))
def test_alter_columns_crash_mid_log_append(spark, tmp_path_factory, steps):
    """A crashed column-evolution commit leaves the recorded schema,
    rename log, and add log untouched — reads keep projecting the old
    logical schema — and the retried alter lands; data reads stay
    correct through every interleaving."""
    root = str(tmp_path_factory.mktemp("alt") / "t")
    model = {k: (str(k % 3), k * 10) for k in range(18)}
    init_table(
        spark, _mk(spark, [(k, p, x) for k, (p, x) in model.items()]), root, "p"
    )
    x_name, extra_live = "x", False

    def _apply(kind):
        nonlocal x_name, extra_live
        if kind == "add" and not extra_live:
            alter_table_columns(root, add=[("extra", "long")])
            extra_live = True
        elif kind == "rename" and x_name == "x":
            alter_table_columns(root, rename={"x": "amount"})
            x_name = "amount"
        elif kind == "rename_back" and x_name == "amount":
            alter_table_columns(root, rename={"amount": "x"})
            x_name = "x"
        elif kind == "drop_added" and extra_live:
            alter_table_columns(root, drop=["extra"])
            extra_live = False
        else:
            return False
        return True

    def _check():
        snap = read_snapshot(spark, root, "p")
        assert (x_name in snap.columns) and ("extra" in snap.columns) == extra_live
        got = {r["k"]: (r["p"], r[x_name]) for r in snap.collect()}
        assert got == model

    for kind, mode in steps:
        if mode == "crash":
            before = read_manifest(root)
            with mock.patch.object(pubmod, "_commit_checked", _boom):
                try:
                    did = _apply(kind)
                except _Boom:
                    did = None  # the alter reached the CAS and crashed
            if did is None:
                after = read_manifest(root)
                assert after == before, "crashed alter mutated the manifest"
            _check()
        _apply(kind)
        _check()


# ---------------------------------------------------------------------------
# 4. value-index refresh: crash mid-apply (between CDC apply and cursor
#    commit) and before apply — the at-least-once replay must converge
# ---------------------------------------------------------------------------

_idx_step = st.tuples(
    st.sampled_from(["merge", "delete"]),
    st.integers(1, 9),
    st.sampled_from(["clean", "crash_cursor", "crash_pre_apply"]),
)


@settings(**_SETTINGS)
@given(st.lists(_idx_step, min_size=1, max_size=4))
def test_index_refresh_crash_mid_apply_converges(
    spark, tmp_path_factory, steps
):
    """Index refresh crashes either BEFORE the CDC apply (nothing moved)
    or AFTER it but before the cursor commit (the r10 ADVICE-high
    replay window: the next refresh re-reads the same span and must be
    idempotent).  After every step the retried refresh converges:
    lookups equal ground truth for every churned value."""
    base = tmp_path_factory.mktemp("idx")
    root, idx = str(base / "t"), str(base / "i")
    model = {k: (str(k % 4), k % 5) for k in range(24)}
    init_table(
        spark, _mk(spark, [(k, p, x) for k, (p, x) in model.items()]), root, "p"
    )
    create_value_index(spark, root, "p", "x", ["k"], idx)

    def churn(kind, seed) -> bool:
        """Apply the op; True iff a table commit actually landed."""
        if kind == "merge":
            keys = [500 + seed, 501 + seed]
            up = {k: (str(k % 4), seed % 5) for k in keys}
            merge_into_versioned(
                spark, root,
                _mk(spark, [(k, p, x) for k, (p, x) in up.items()]), ["k"], "p",
            )
            model.update(up)
            return True
        gone = [k for k in model if k % 4 == seed % 4 and k < 100]
        if not gone:
            return False  # predicate matches nothing: documented no-op
        delete_from_versioned(
            spark, root, "p", (F.col("k") % 4 == seed % 4) & (F.col("k") < 100)
        )
        for k in gone:
            model.pop(k)
        return True

    def check_lookups():
        for v in range(5):
            want = {p for (p, x) in model.values() if x == v}
            got = index_lookup_partitions(spark, idx, v)
            assert got == want, f"value {v}: index {got} != truth {want}"

    for kind, seed, mode in steps:
        committed = churn(kind, seed)
        if mode == "crash_cursor":
            # entering a step the index is always caught up (every step
            # ends with a clean refresh), so when the churn was a no-op
            # the refresh returns before the cursor commit and the
            # injected crash legitimately cannot fire (the 100-example
            # soak found the delete-twice sequence; same documented
            # no-op class as the original net)
            with mock.patch.object(
                pubmod.TableFollower, "commit", _boom
            ):
                try:
                    refresh_value_index(spark, idx)
                    if committed:
                        raise AssertionError("crash did not propagate")
                except _Boom:
                    if not committed:
                        raise AssertionError(
                            "caught-up refresh spuriously committed the cursor"
                        )
        elif mode == "crash_pre_apply":
            import datalake2anomali_spark.io.index as idxmod

            with mock.patch.object(idxmod, "cdc_apply_versioned", _boom):
                try:
                    refresh_value_index(spark, idx)
                except _Boom:
                    pass  # span with no churned pairs commits before apply
        v = refresh_value_index(spark, idx)
        assert v == read_manifest(root)["version"]
        check_lookups()


# ---------------------------------------------------------------------------
# 5. maintenance ops: compact / partial OPTIMIZE / restore crash at the CAS
# ---------------------------------------------------------------------------

_maint_step = st.tuples(
    st.sampled_from(["merge", "compact", "optimize"]),
    st.integers(1, 9),
    st.sampled_from(["clean", "crash", "crash_vacuum"]),
)


@settings(**_SETTINGS)
@given(st.lists(_maint_step, min_size=2, max_size=5))
def test_maintenance_crash_leaves_state_and_retry_lands(
    spark, tmp_path_factory, steps
):
    """Compaction and partial OPTIMIZE never change logical state, so
    the invariant is total: after ANY maintenance op — crashed at the
    CAS, vacuumed after the crash, or clean — the table reads exactly
    the model; crashed merges leave no trace and their retry lands."""
    from datalake2anomali_spark.io.publish import (
        compact_versioned,
        optimize_partitions,
        vacuum,
    )

    root = str(tmp_path_factory.mktemp("maint") / "t")
    model = {k: (str(k % 3), k * 10) for k in range(24)}
    # fragment so OPTIMIZE has work from the start
    init_table(
        spark,
        _mk(spark, [(k, p, x) for k, (p, x) in model.items()])
        .repartition(4)
        .localCheckpoint(eager=True),
        root,
        "p",
    )

    for kind, seed, mode in steps:
        def run():
            if kind == "merge":
                up = {800 + seed * 3 + i: (str(i % 3), seed) for i in range(3)}
                merge_into_versioned(
                    spark, root,
                    _mk(spark, [(k, p, x) for k, (p, x) in up.items()]),
                    ["k"], "p",
                )
                return up
            if kind == "compact":
                compact_versioned(spark, root, "p", "k")
            else:
                optimize_partitions(spark, root, "p", "k", min_files=2)
            return {}

        if mode != "clean":
            before = read_manifest(root)
            with mock.patch.object(pubmod, "_commit_checked", _boom):
                try:
                    run()
                    reached_cas = False  # op found no work
                except _Boom:
                    reached_cas = True
            assert read_manifest(root) == before, f"crashed {kind} moved the manifest"
            assert _state(spark, root) == model, f"crashed {kind} left a trace"
            if not reached_cas:
                assert kind == "optimize", f"{kind} must always reach the CAS"
            if mode == "crash_vacuum":
                vacuum(root, retain_last=1, claim_ttl_seconds=0.0)
                assert _state(spark, root) == model, "vacuum after crash drifted"
        model.update(run())
        assert _state(spark, root) == model, f"clean {kind} retry did not land"


@settings(**_SETTINGS)
@given(
    n_commits=st.integers(1, 3),
    target_idx=st.integers(0, 3),
    seed=st.integers(1, 9),
)
def test_restore_crash_at_cas_then_retry(
    spark, tmp_path_factory, n_commits, target_idx, seed
):
    """RESTORE crashes at the CAS: the head is untouched; the retried
    restore publishes a NEW commit whose state equals the historical
    model exactly (append-only history, never a pointer rewind)."""
    root = str(tmp_path_factory.mktemp("rst") / "t")
    model = {k: (str(k % 3), k * 10) for k in range(18)}
    init_table(
        spark, _mk(spark, [(k, p, x) for k, (p, x) in model.items()]), root, "p"
    )
    history = [(read_manifest(root)["version"], dict(model))]
    for i in range(n_commits):
        up = {900 + i * 5 + j: (str(j % 3), seed + i) for j in range(2)}
        merge_into_versioned(
            spark, root, _mk(spark, [(k, p, x) for k, (p, x) in up.items()]),
            ["k"], "p",
        )
        model.update(up)
        history.append((read_manifest(root)["version"], dict(model)))

    t_version, t_model = history[min(target_idx, len(history) - 1)]
    before = read_manifest(root)
    with mock.patch.object(pubmod, "_commit_checked", _boom):
        try:
            restore_version(root, t_version)
            raise AssertionError("crash did not propagate")
        except _Boom:
            pass
    assert read_manifest(root) == before, "crashed restore moved the head"
    assert _state(spark, root) == model

    v_new = restore_version(root, t_version)
    assert v_new > before["version"], "restore must append, not rewind"
    assert _state(spark, root) == t_model, "retried restore wrong state"


# ---------------------------------------------------------------------------
# 6. hidden-table spec evolution: crash at the spec-file swap
# ---------------------------------------------------------------------------

def test_spec_evolution_crash_before_swap(spark, tmp_path_factory):
    """evolve_partition_spec crashes at the instant before its atomic
    spec-file replace (after the fsync'd tmp write): the recorded
    generations are untouched, writes keep landing under the OLD
    layout, the orphaned .tmp is harmless, and the retried evolve
    lands — subsequent writes relocate to the new generation and
    pruned reads stay exact across the mixed layout."""
    from datalake2anomali_spark.io.hidden import (
        SPEC_FILE,
        _load_generations,
        evolve_partition_spec,
        init_hidden_table,
        merge_into_hidden,
        read_hidden,
    )

    root = str(tmp_path_factory.mktemp("spec") / "t")
    model = {k: (k % 7, k * 10) for k in range(40)}
    df = _mk(
        spark, [(k, g, x) for k, (g, x) in model.items()], "k long, g long, x long"
    )
    init_hidden_table(spark, df, root, ["bucket", 4, "k"])
    gens0 = _load_generations(root)
    assert len(gens0) == 1

    # the injection point is the ownership check between the tmp fsync
    # and the os.replace — the worst instant of the spec commit
    with mock.patch.object(pubmod, "_verify_lock_ownership", _boom):
        try:
            evolve_partition_spec(root, ["bucket", 8, "k"])
            raise AssertionError("crash did not propagate")
        except _Boom:
            pass
    assert _load_generations(root) == gens0, "crashed evolve changed the spec"
    assert os.path.exists(os.path.join(root, SPEC_FILE + ".tmp"))

    # writes still land under the OLD layout
    up1 = {100 + i: (i % 7, 1) for i in range(3)}
    merge_into_hidden(
        spark, root,
        _mk(spark, [(k, g, x) for k, (g, x) in up1.items()],
            "k long, g long, x long"),
        ["k"],
    )
    model.update(up1)

    # the retried evolve lands (and overwrites the orphan tmp)
    assert evolve_partition_spec(root, ["bucket", 8, "k"]) == 1
    assert len(_load_generations(root)) == 2
    up2 = {200 + i: (i % 7, 2) for i in range(3)}
    merge_into_hidden(
        spark, root,
        _mk(spark, [(k, g, x) for k, (g, x) in up2.items()],
            "k long, g long, x long"),
        ["k"],
    )
    model.update(up2)

    got = {
        r["k"]: (r["g"], r["x"]) for r in read_hidden(spark, root).collect()
    }
    assert got == model
    # pruned point lookups stay exact across the mixed g0/g1 layout
    for probe in (1, 100, 201):
        got_k = {
            r["k"]
            for r in read_hidden(spark, root, ("eq", "k", probe)).collect()
        }
        assert got_k == ({probe} if probe in model else set())
