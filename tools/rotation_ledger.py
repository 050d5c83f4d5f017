"""Recompute the driver-certification staleness ledger.

The driver's correctness gate checks exactly the FIRST ``GATE_WINDOW``
registered queries each round.  With the registry larger than twice the
window, the achievable invariant (VERDICT r6 #1) is:

    no query goes ``STALENESS_BOUND`` rounds without a driver row —
    i.e. a query last certified in round L must re-enter the checked
    window no later than round L + STALENESS_BOUND, and a query that has
    never been certified must be in the window immediately.

This script derives ``{query: last_certified_round}`` from the committed
``CORRECTNESS_r*.json`` evidence files (a row counts only when rows,
schema and value-hash all match with no error) and writes
``docs/rotation_ledger.json``.  ``tests/test_entry_contract.py`` asserts
the committed ledger equals this derivation and that the current
``_PRIORITY`` window satisfies the bound — so a new round's evidence
file landing in git forces the rotation chore before tests go green.

Usage:  python tools/rotation_ledger.py [--check]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO, "docs", "rotation_ledger.json")
GATE_WINDOW = 50
# Why 4 (raised from 3 in round 12): the registry is at its 150-entry
# certifiable ceiling over a 50-row window, so a perfect 3-round cycle
# covers every query with ZERO slack — bound 3 tolerates no failure,
# ever.  column_evolution's round-11 exposure errored (the init_table
# NameError), making its re-exposure mandatory in round 12 alongside the
# 50-strong round-9 cohort at its deadline: 51 mandatory entries in a
# 50-row window, permanently infeasible at bound 3 (the displaced entry
# cascades +1 every subsequent round).  Bound 4 = ceil(150/50) + 1 is
# the tightest bound that tolerates one red row per cycle: each round at
# most one cohort entry defers a single round, inside the bound, and the
# cascade stays size-1 forever.  This is the "raise the bound honestly"
# branch of tests/test_entry_contract.py's satisfiability assertion.
STALENESS_BOUND = 4

#: Round in which each never-yet-certified query was first registered
#: (needed because the evidence files cannot date a query they have no
#: row for).  Entries are removed once the query earns its first row.
REGISTERED_ROUND: dict[str, int] = {
    "update_set": 11,
    "update_mor": 11,
    "multi_statement_txn": 11,
    "secondary_index_lookup": 11,
    "cross_table_txn": 11,
    "shallow_clone_divergence": 11,
    "branch_merge_disjoint": 11,
    "column_evolution": 11,
    "stream_into_hidden": 11,
    "sync_versioned": 10,
    "branch_wap_publish": 10,
    "deletion_vectors": 10,
    "cdc_apply_mixed": 10,
    "spec_evolution": 10,
    "multi_field_spec": 10,
    "metadata_tables": 10,
    "optimize_zorder": 10,
    "check_constraints": 10,
    "negative_samples": 10,
    "weighted_sample_aes": 10,
    "pca_project": 10,
    "ann_pq_topk": 10,
    "k_core_decomposition": 10,
    "bpe_tokenize": 10,
    "asof_join_directions": 10,
    "bloom_semi_join": 10,
    "csv_orc_roundtrip": 10,
    "stream_enrich_snapshot": 10,
    "table_follower_rollup": 10,
    "ann_ivfpq_topk": 10,
    "multi_table_txn": 10,
    "merge_schema_widening": 10,
    "stream_interval_join_full": 8,
    "cdc_view_maintenance": 8,
    "delete_restore_history": 8,
    "hidden_partition_pruning": 8,
    "attribution_credit": 6,
    "global_rank": 6,
    "cube_stats": 6,
    "khop_features": 6,
    "stream_interval_join_outer": 6,
    "table_changes": 6,
    "equi_depth_hist": 6,
    "window_rank_funcs": 6,
    "groupwise_quantiles": 6,
    "q7_volume_shipping": 6,
    "q8_market_share": 6,
    "k_anonymity": 6,
    "stream_upsert_exactly_once": 6,
    "cdf_probe": 6,
    "pagerank_dangling": 7,
    "groupwise_percentile_cont": 7,
    "q9_product_profit": 7,
    "snapshot_bloom_scan": 7,
}


def certified_rows() -> dict[str, int]:
    """{query: latest round with a fully green driver row}."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            green = (
                row.get("rows_match") is True
                and row.get("schema_match") is True
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


def build_ledger() -> dict:
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod

    registered = list(entrymod.queries())
    last = certified_rows()
    next_round = max(last.values()) + 1
    queries = {}
    for name in registered:
        entry: dict = {"last_certified": last.get(name)}
        if name not in last:
            if name not in REGISTERED_ROUND:
                raise SystemExit(
                    f"{name} has no driver row and no REGISTERED_ROUND entry; "
                    "add it to tools/rotation_ledger.py"
                )
            entry["registered"] = REGISTERED_ROUND[name]
        queries[name] = entry
    return {
        "gate_window": GATE_WINDOW,
        "staleness_bound": STALENESS_BOUND,
        "next_round": next_round,
        "queries": queries,
    }


def main() -> int:
    ledger = build_ledger()
    if "--check" in sys.argv:
        with open(LEDGER_PATH) as fh:
            committed = json.load(fh)
        if committed != ledger:
            print("ledger stale — rerun tools/rotation_ledger.py", file=sys.stderr)
            return 1
        print("ledger up to date")
        return 0
    with open(LEDGER_PATH, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=False)
        fh.write("\n")
    print(f"wrote {LEDGER_PATH} (next_round={ledger['next_round']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
