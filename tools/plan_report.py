"""Generate docs/PLANS.md: per-query physical-plan shape inventory.

For every registered query, build the plan at the given SF and count the
operators that matter at 100 TB: hash-shuffle exchanges, broadcast
exchanges, sort-merge vs broadcast-hash joins, Python/Arrow evaluation
nodes, and whole-stage-codegen spans.  Streaming queries execute eagerly in
their runner, so they are listed with their batch-twin shape note instead.

Usage::

    python tools/plan_report.py [sf_dir]   # default /root/testdata/sf0.001
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SKIP = {
    "pagerank_dangling": "iterative loop with per-iteration localCheckpoint (plan-growth hygiene); per-iteration shape = pagerank's message join/agg pair + dangling semijoin + 1-row share broadcast",
    # these execute a streaming runner (or an iterative driver loop) when the
    # plan is built, so a static single-plan row would be misleading
    "stream_tumbling_counts": "streaming runner; batch twin = streaming/windows.py: tumbling_counts (same transform + oracle)",
    "stream_dedup_events": "streaming runner; state-bounded dedup, see streaming/incremental.py",
    "stream_dedup_late": "streaming runner; 3-batch watermark-semantics replay, see streaming/incremental.py",
    "corpus_roundtrip": "executes a corpus write eagerly; layout/pruning pinned in tests/test_corpus_io.py",
    # derived checks materialize their one-row summary eagerly (cache
    # hygiene, plans/llm_queries.py:_eager_summary) so the built "plan" is a
    # LocalTableScan; the operator plans live in their raw entries below
    "dedup_minhash_lsh": "eager derived check; raw operator plan = map-only signatures + banded equi-join (llm/dedup.py)",
    "dedup_simhash": "eager derived check; raw operator plan = map-only signatures + 4-segment equi-joins (llm/dedup.py)",
    "ann_lsh_topk": "eager derived check; raw operator plan = L-table bucketing + equi-join (llm/similarity.py)",
    "ann_ivf_topk": "eager derived check; raw operator plan = bounded driver-trained quantizer + distributed assignment (llm/similarity.py)",
    "ann_topk_quantized": "eager derived check; raw operator plan = int8 GEMM scan (llm/similarity.py)",
    "embedding_neardup_lsh": "eager derived check; raw operator plan = sign-LSH buckets + verify (llm/similarity.py)",
    "stateful_user_profiles": "streaming runner; applyInPandasWithState",
    "stream_burst_alerts": "streaming runner; applyInPandasWithState burst state, batch twin = burst_alerts",
    "stream_interval_join": "streaming runner; watermarked stream-stream interval join, see streaming/joins.py",
    "dedup_clusters": "iterative (O(diameter) rounds); per-round = 1 join + 1 min-agg, see llm/graph.py",
    "dedup_clusters_star": "iterative (O(log n) rounds); alternating large/small star, see llm/graph.py: connected_components_star",
    "dedup_incremental": "eager summary (cache hygiene); raw operator plan = digest anti-check + cross-index equi-join (llm/dedup.py: dedup_against)",
    "embedding_kmeans": "eager derived check; iterative (1 job/round: map-only GEMM assign + combined centroid agg), see llm/cluster.py",
    "jsonl_roundtrip": "executes a JSONL write eagerly; read-back plan = schema-explicit scan + 1 agg (io/jsonl.py)",
}


_PY_NODES = {
    "ArrowEvalPythonExec",
    "MapInPandasExec",
    "FlatMapGroupsInPandasExec",
    "FlatMapGroupsInPandasWithStateExec",
    "BatchEvalPythonExec",
}


def _plan_counts(df) -> tuple[tuple[int, int, int, int, int, int], int]:
    """Count scale-relevant operators by WALKING the physical plan tree.

    ``executedPlan().toString()`` prints every persisted intermediate's build
    plan repeatedly (once per cache scan, times AQE's initial+final copies),
    so string-counting over it over-reports exchanges several-fold for any
    operator that persists (the jaccard family).  Tree traversal via
    ``children()`` is exact: `InMemoryTableScan` has no children, so cached
    build plans (one-time materialization cost) are excluded, and
    `ReusedExchange` references aren't double-counted.  AQE roots are
    unwrapped to their pre-execution plan, matching the doc header.
    Returns ((hashEx, rangeEx, bcast, SMJ, BHJ, pyEval), n_cache_scans).
    """
    counts = [0, 0, 0, 0, 0, 0]
    cache_scans = [0]

    def walk(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if cls == "ShuffleExchangeExec":
            part = node.outputPartitioning().toString()
            if part.startswith("hashpartitioning"):
                counts[0] += 1
            elif part.startswith("rangepartitioning"):
                counts[1] += 1
        elif cls == "BroadcastExchangeExec":
            counts[2] += 1
        elif cls == "SortMergeJoinExec":
            counts[3] += 1
        elif cls == "BroadcastHashJoinExec":
            counts[4] += 1
        elif cls in _PY_NODES:
            counts[5] += 1
        elif cls == "InMemoryTableScanExec":
            cache_scans[0] += 1
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return tuple(counts), cache_scans[0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from datalake2anomali_spark.session import get_spark

    import __spark_entry__ as entry

    from bench import RAW_OPS

    spark = get_spark("plan_report", cpus="8")
    rows = []
    items = list(entry.queries().items())
    # the approximate operators' registered entries are eager derived checks
    # (LocalTableScan after materialization); append their raw operator plans
    # so the inventory still shows the shape that matters at scale
    items += [(f"{name} (raw op)", fn) for name, fn in RAW_OPS.items()]
    for name, fn in items:
        if name in SKIP:
            rows.append((name, None, SKIP[name]))
            continue
        df = fn(spark, sf_dir)
        c, n_cache = _plan_counts(df)
        note = (
            f"reads {n_cache} persisted intermediate(s); one-time build cost excluded"
            if n_cache
            else ""
        )
        rows.append((name, c, note))
    lines = [
        "# Physical-plan inventory (generated by tools/plan_report.py)",
        "",
        f"Built against `{sf_dir}` (pre-execution AQE plans). Regenerate after",
        "any operator change. Columns: hash/range shuffle exchanges, broadcast",
        "exchanges, sort-merge vs broadcast-hash joins, Python/Arrow eval",
        "nodes. A query with pyEval > 0 crosses into Python only through",
        "Arrow-batched nodes (no row-at-a-time UDF appears anywhere).",
        "Counts are exact tree-walk counts of the live per-run plan; the",
        "one-time build plans of persisted intermediates (under",
        "InMemoryRelation) are excluded, with cache reads flagged in the",
        "note column.",
        "",
        "| query | hashEx | rangeEx | bcast | SMJ | BHJ | pyEval | note |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, counts, note in rows:
        if counts is None:
            lines.append(f"| {name} | – | – | – | – | – | – | {note} |")
        else:
            h, r, b, s, j, py = counts
            lines.append(f"| {name} | {h} | {r} | {b} | {s} | {j} | {py} | {note} |")
    out = "\n".join(lines) + "\n"
    with open("/root/repo/docs/PLANS.md", "w") as f:
        f.write(out)
    print(f"wrote docs/PLANS.md ({len(rows)} queries)")


if __name__ == "__main__":
    main()
