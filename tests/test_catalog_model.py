"""Model-based property test for the catalog retention contract.

Hypothesis interleaves member-table writes, catalog re-pins, catalog
transactions, catalog-history expiry, and pin-protected member vacuums.
The invariants, checked after every step: (1) the live catalog view of
the member always equals the model state AT ITS PIN (not the table
head); (2) a vacuum fed ``catalog_pinned_versions`` never reclaims a
snapshot any retained catalog version still serves — every addressable
catalog snapshot keeps reading exactly its pinned state.  The round-9/10
work fixed real bugs in exactly this math (fail-closed pins, history
expiry); this net keeps them fixed under orderings no fixture scripts.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from datalake2anomali_spark.io.catalog import (
    CatalogTransaction,
    catalog_manifest,
    catalog_pinned_versions,
    catalog_read,
    catalog_register,
    create_catalog,
    expire_catalog_versions,
)
from datalake2anomali_spark.io.publish import (
    init_table,
    merge_into_versioned,
    read_manifest,
    vacuum,
)

from tests.conftest import hyp_settings

_SETTINGS = hyp_settings()

_op = st.one_of(
    st.tuples(st.just("write"), st.integers(1, 9)),      # table-only commit
    st.tuples(st.just("repin"), st.just(0)),             # catalog_register
    st.tuples(st.just("txn"), st.integers(1, 9)),        # write + atomic pin
    st.tuples(st.just("expire"), st.integers(1, 3)),     # keep_last N
    st.tuples(st.just("vacuum"), st.just(0)),            # pin-protected
)


def _state(spark, croot, catalog_version=None):
    df = catalog_read(spark, croot, "t", "p", catalog_version)
    return {r["k"]: r["x"] for r in df.collect()}


@settings(**_SETTINGS)
@given(st.lists(_op, min_size=3, max_size=6))
def test_catalog_retention_under_interleavings(
    spark, tmp_path_factory, ops
):
    base_dir = tmp_path_factory.mktemp("catmodel")
    root = str(base_dir / "t")
    croot = str(base_dir / "cat")
    model = {k: k for k in range(24)}
    df = spark.createDataFrame(
        [(k, str(k % 3), x) for k, x in model.items()],
        "k long, p string, x long",
    )
    init_table(spark, df, root, "p")
    create_catalog(croot)
    catalog_register(croot, "t", root)

    pinned_model = dict(model)  # what the LIVE catalog pin serves
    # every still-addressable catalog version -> the model it must serve
    snapshots = {catalog_manifest(croot)["version"]: dict(model)}

    def _write(seed):
        src = spark.createDataFrame(
            [(k, str(k % 3), k * 100 + seed) for k in range(seed, seed + 6)],
            "k long, p string, x long",
        )
        v = merge_into_versioned(spark, root, src, ["k"], "p")
        for k in range(seed, seed + 6):
            model[k] = k * 100 + seed
        return v

    for kind, arg in ops:
        if kind == "write":
            _write(arg)  # table head moves, catalog pin does not
        elif kind == "repin":
            cv = catalog_register(croot, "t", root)
            pinned_model = dict(model)
            snapshots[cv] = dict(model)
        elif kind == "txn":
            ctx = CatalogTransaction(croot)
            v = _write(arg)
            ctx.advance("t", v)
            cv = ctx.commit()
            pinned_model = dict(model)
            snapshots[cv] = dict(model)
        elif kind == "expire":
            live = catalog_manifest(croot)["version"]
            removed = expire_catalog_versions(croot, keep_last=arg)
            for cv in removed:
                snapshots.pop(cv, None)
            assert live not in removed
        else:  # vacuum with catalog pins protected
            pins = catalog_pinned_versions(croot, root)
            vacuum(root, retain_last=1, claim_ttl_seconds=0.0,
                   protect_versions=pins)
        # invariant 1: the live catalog view serves its pin, not the head
        assert _state(spark, croot) == pinned_model, f"live view after {kind}"
        # invariant 2: every retained catalog snapshot still reads intact
        for cv, snap_model in snapshots.items():
            assert _state(spark, croot, catalog_version=cv) == snap_model, (
                f"catalog v{cv} drifted after {kind}"
            )

    # the table HEAD (not the catalog view) carries every model write
    from datalake2anomali_spark.io.publish import read_snapshot

    head_state = {
        r["k"]: r["x"] for r in read_snapshot(spark, root, "p").collect()
    }
    assert head_state == model, "table head missing model writes"
    assert read_manifest(root)["version"] >= 1
