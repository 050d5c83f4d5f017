"""Model-based property test for the branch / write-audit-publish
algebra.

Hypothesis interleaves random DML on MAIN and on a BRANCH (each side a
dict model), then closes with the publish step: when main never moved,
``fast_forward`` must land exactly the branch model; when both sides
moved on DISJOINT partitions, ``merge_branch`` must assemble the union
(branch-touched partitions from the branch, main-touched from main);
when they collide, ``MergeConflictError`` — and main must be bit-equal
to its pre-merge state after a refused merge.  Branch isolation is
asserted after every single commit on either side.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io.publish import (
    MergeConflictError,
    create_branch,
    delete_from_versioned,
    init_table,
    merge_branch,
    merge_into_versioned,
    read_snapshot,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()

_PARTS = ["a", "b", "c", "d"]

# each op: (side, kind, partition_idx, payload_seed) — partitions are
# the conflict unit, so drawing them explicitly lets examples cover
# disjoint AND colliding interleavings
_op = st.tuples(
    st.sampled_from(["main", "branch"]),
    st.sampled_from(["merge", "delete"]),
    st.integers(0, 3),
    st.integers(1, 9),
)


def _state(spark, root, ref=None):
    rows = read_snapshot(spark, root, "p", ref=ref).collect()
    return {r["k"]: (r["p"], r["x"]) for r in rows}


def _merge_keys(part: int) -> list[int]:
    # strictly NEW keys (base is 0..31), disjoint per partition: an
    # overlap with base keys would make the merge partition-MOVING and
    # touch the keys' old homes too — a different (already-pinned)
    # ownership shape than the one this model tracks
    return list(range(1000 + part * 100, 1000 + part * 100 + 8))


def _apply_model(model, kind, part, seed):
    """Returns (model, touched): touched is None for a no-op commit —
    the engine commits nothing for a predicate matching no rows, so the
    partition's owner version does not move."""
    if kind == "merge":
        for k in _merge_keys(part):
            model[k] = (_PARTS[part], k + seed)
        return model, _PARTS[part]
    doomed = [
        k
        for k, (p, _x) in model.items()
        if p == _PARTS[part] and k % 2 == seed % 2
    ]
    for k in doomed:
        del model[k]
    return model, (_PARTS[part] if doomed else None)


@settings(**_SETTINGS)
@given(st.lists(_op, min_size=2, max_size=5))
def test_branch_interleavings_match_models(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("branch") / "t")
    base = {k: (_PARTS[k % 4], k) for k in range(32)}
    df = spark.createDataFrame(
        [(k, p, x) for k, (p, x) in base.items()], "k long, p string, x long"
    )
    init_table(spark, df, root, "p")
    create_branch(root, "work")
    m_model = dict(base)
    b_model = dict(base)
    m_touched: set[str] = set()
    b_touched: set[str] = set()

    for side, kind, part, seed in ops:
        ref = None if side == "main" else "work"
        if kind == "merge":
            src = spark.createDataFrame(
                [(k, _PARTS[part], k + seed) for k in _merge_keys(part)],
                "k long, p string, x long",
            )
            merge_into_versioned(spark, root, src, ["k"], "p", ref=ref)
        else:
            delete_from_versioned(
                spark,
                root,
                "p",
                (F.col("p") == _PARTS[part]) & (F.col("k") % 2 == seed % 2),
                ref=ref,
            )
        if side == "main":
            m_model, touched = _apply_model(m_model, kind, part, seed)
            if touched is not None:
                m_touched.add(touched)
        else:
            b_model, touched = _apply_model(b_model, kind, part, seed)
            if touched is not None:
                b_touched.add(touched)
        # isolation after EVERY commit: each side reads its own model
        assert _state(spark, root) == m_model, f"main drifted after {side}"
        assert _state(spark, root, ref="work") == b_model, (
            f"branch drifted after {side}"
        )

    if not m_touched:
        # main never moved: fast-forward path (merge_branch delegates)
        merge_branch(root, "work")
        assert _state(spark, root) == b_model
    elif m_touched & b_touched:
        before = _state(spark, root)
        try:
            merge_branch(root, "work")
            raise AssertionError(
                f"collision on {sorted(m_touched & b_touched)} not refused"
            )
        except MergeConflictError:
            pass
        assert _state(spark, root) == before, "refused merge moved main"
    else:
        merge_branch(root, "work")
        # disjoint assembly: branch-touched partitions come wholly from
        # the branch, everything else from main (which includes base)
        want = {k: v for k, v in m_model.items() if v[0] not in b_touched}
        want.update(
            {k: v for k, v in b_model.items() if v[0] in b_touched}
        )
        assert _state(spark, root) == want, "disjoint merge assembly drifted"
