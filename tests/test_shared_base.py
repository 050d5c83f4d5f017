"""Pins for the shared-events-base swap/sweep protocol (ADVICE r12).

The protocol fixtures share one immutable events table per (sf_dir,
source content); rebuilds swap a privately-built tree into place and
NEVER delete a displaced tree synchronously, because Spark resolves
plan files lazily — a reader that captured the old path can still be
mid-scan after the swap.  All deletion goes through an age-gated sweep
(`_sweep_debris`).  These tests pin the three load-bearing behaviors:
the sweep's age gate and name filter, the displacement-time utime stamp
(a displaced tree must NOT be sweep-eligible at its BUILD age), and the
end-to-end rebuild leaving the displaced tree intact and readable while
the new root serves the fresh stamp.
"""

from __future__ import annotations

import os
import time

from datalake2anomali_spark.plans import protocol_queries as pq
from datalake2anomali_spark.io.publish import read_manifest


def _mk_tree(path: str, age_sec: float) -> str:
    os.makedirs(path)
    with open(os.path.join(path, "part-0.parquet"), "w") as fh:
        fh.write("x")
    old = time.time() - age_sec
    os.utime(path, (old, old))
    return path


_DEAD_PID = 10**9  # beyond any real pid_max: os.kill raises, never alive


def test_sweep_debris_is_age_gated_and_name_scoped(tmp_path):
    root = str(tmp_path / "base")
    expired_build = _mk_tree(f"{root}.build.{_DEAD_PID}", age_sec=120)
    expired_stale = _mk_tree(f"{root}.stale.222.9", age_sec=120)
    fresh_stale = _mk_tree(f"{root}.stale.333.7", age_sec=1)
    # name-scoped: a sibling that merely shares the prefix string but is
    # not a .build./.stale. child must survive any age
    bystander = _mk_tree(str(tmp_path / "base_other"), age_sec=9999)

    pq._sweep_debris(root, grace_sec=60.0)

    assert not os.path.exists(expired_build), "crashed-build debris kept"
    assert not os.path.exists(expired_stale), "expired displaced tree kept"
    assert os.path.exists(fresh_stale), "in-grace displaced tree deleted"
    assert os.path.exists(bystander), "unrelated sibling deleted"


def test_sweep_never_takes_a_live_builders_tree(tmp_path):
    """A builder legitimately slower than the grace period (big sf,
    starved box) must not have its in-flight .build tree yanked by a
    concurrent process's sweep — only trees whose owner pid is dead are
    age-gated (code-review r13)."""
    root = str(tmp_path / "base")
    live = _mk_tree(f"{root}.build.{os.getpid()}", age_sec=9999)
    dead = _mk_tree(f"{root}.build.{_DEAD_PID}", age_sec=9999)

    pq._sweep_debris(root, grace_sec=60.0)

    assert os.path.exists(live), "live builder's in-flight tree swept"
    assert not os.path.exists(dead), "dead builder's debris kept"


def test_sweep_debris_missing_base_is_noop(tmp_path):
    pq._sweep_debris(str(tmp_path / "absent" / "base"))  # must not raise


def test_rebuild_defers_displaced_tree_and_restamps_it(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Force a rebuild through the real `_shared_events_root` against a
    private base dir: the displaced old tree must (a) still exist after
    the swap with its manifest readable — the reader-race guarantee —
    and (b) carry a DISPLACEMENT-time mtime, not its build-time mtime,
    so it is not sweep-eligible the instant it is displaced."""
    monkeypatch.setattr(pq, "_shared_base_dir", lambda: str(tmp_path))

    root = pq._shared_events_root(spark, sf_dir)
    assert root.startswith(str(tmp_path))
    v0 = read_manifest(root)["version"]

    # cached fast path: same stamp → same root, no stale sibling appears
    assert pq._shared_events_root(spark, sf_dir) == root
    assert not [n for n in os.listdir(tmp_path) if ".stale." in n]

    # the fast path SWEEPS: an expired displaced tree from a long-past
    # rebuild is collected even though no rebuild happens (the leak the
    # rebuild-only sweep had — code-review r13)
    leak = _mk_tree(f"{root}.stale.1.1", age_sec=2 * pq._DEBRIS_GRACE_SEC)
    assert pq._shared_events_root(spark, sf_dir) == root
    assert not os.path.exists(leak), "fast path left the displaced tree"

    # age the root so build-time mtime would be sweep-eligible, then
    # corrupt the stamp to force the rebuild+swap path
    old = time.time() - 7200
    os.utime(root, (old, old))
    with open(os.path.join(root, "_SOURCE_STAMP"), "w") as fh:
        fh.write("stale-stamp")

    assert pq._shared_events_root(spark, sf_dir) == root

    stales = [n for n in os.listdir(tmp_path) if ".stale." in n]
    assert len(stales) == 1, f"displaced tree not deferred: {stales}"
    displaced = str(tmp_path / stales[0])
    # the displaced tree is the COMPLETE old root: manifest still reads
    assert read_manifest(displaced)["version"] == v0
    # restamped at displacement: within grace despite the 2h-old build
    assert time.time() - os.stat(displaced).st_mtime < pq._DEBRIS_GRACE_SEC
    # and the new root serves the fresh stamp + a readable manifest
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    with open(os.path.join(root, "_SOURCE_STAMP")) as fh:
        assert fh.read() == f"{st.st_mtime_ns}:{st.st_size}"
    assert read_manifest(root)["version"] == v0
    # no crashed-build debris left behind by a clean swap
    assert not [n for n in os.listdir(tmp_path) if ".build." in n]
