"""Measured-margin audit for the bounded-approximation gates that the
ANN/LSH audit (docs/BENCH_NOTES.md §R13 addendum) did not cover:
``sketch_stats`` (HLL++ relative error + quantile rank error),
``cms_counts`` (ε·N overcount), ``snapshot_bloom_scan`` (partition-bloom
skip rate on absent probes), and ``bloom_semi_join`` (bitmap FPR on the
reduced probe side).

    python tools/margin_audit.py /root/testdata/sf0.01 [gate ...]

For each gate it prints the MEASURED worst-case error next to the
asserted bound, at the registered configuration — the same
one-scale-up policy that caught ann_pq_topk's m=16 recall failure in
r13 (VERDICT r13 task 4).  Output is one JSON line per gate so the
committed margin table in BENCH_NOTES can quote it verbatim.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datalake2anomali_spark.io.tables import load_table  # noqa: E402
from datalake2anomali_spark.session import get_spark  # noqa: E402


def audit_sketch_stats(spark, sf_dir: str) -> dict:
    """Worst-case measured HLL++ relative error and quantile rank-error
    fraction at the registered sketch_stats config (events grouped by
    event_type, id=user_id, value=value, rsd=0.05, accuracy=10000)."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.col("value")).alias("n"),
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.05).alias("hll"),
        F.percentile_approx(
            "value", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
        ).alias("qa"),
    )
    ranks = (
        e.select("event_type", "value")
        .join(F.broadcast(agg.select("event_type", "qa")), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") <= F.col("qa")[0]).cast("long")).alias("le50"),
            F.sum((F.col("value") <= F.col("qa")[1]).cast("long")).alias("le95"),
        )
    )
    rows = agg.join(ranks, "event_type").collect()
    hll_rel = max(abs(r["hll"] - r["exact"]) / r["exact"] for r in rows)
    # the gate's slack is rank_frac_bound·n + 2; report the measured
    # rank-error FRACTION net of the +2 absolute term
    r50 = max(max(0.0, abs(r["le50"] - 0.5 * r["n"]) - 2) / r["n"] for r in rows)
    r95 = max(max(0.0, abs(r["le95"] - 0.95 * r["n"]) - 2) / r["n"] for r in rows)
    return {
        "gate": "sketch_stats",
        "hll_rel_err": round(hll_rel, 4),
        "hll_bound": 0.15,
        "rank_frac_p50": round(r50, 5),
        "rank_frac_p95": round(r95, 5),
        "rank_frac_bound": 0.03,
        "groups": len(rows),
    }


def audit_cms_counts(spark, sf_dir: str) -> dict:
    """Worst-case measured CMS overcount vs the ε·N slack at the
    registered cms_counts config (events.user_id, ε=0.001, δ=0.01,
    seed=42, the registered probe set)."""
    from datalake2anomali_spark.functions.sketches import cms_probe_summary
    from datalake2anomali_spark.plans.scale_queries import CMS_PROBES

    e = load_table(spark, sf_dir, "events")
    n_total = e.agg(F.count(F.col("user_id"))).collect()[0][0]
    slack = math.ceil(0.001 * n_total)
    # re-derive the raw estimates (cms_probe_summary returns booleans;
    # the audit needs the distances)
    sk_bytes = e.agg(
        F.count_min_sketch(
            F.col("user_id"), F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("sk")
    ).collect()[0]["sk"]
    jvm = spark._jvm
    sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk_bytes))
    )
    exact = {
        r["k"]: r["n"]
        for r in e.filter(F.col("user_id").isin(CMS_PROBES))
        .groupBy(F.col("user_id").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    worst_over, undercounts = 0, 0
    for p in CMS_PROBES:
        est = sk.estimateCount(jvm.java.lang.Long.parseLong(str(int(p))))
        true_n = int(exact.get(p, 0))
        worst_over = max(worst_over, est - true_n)
        if est < true_n:
            undercounts += 1
    return {
        "gate": "cms_counts",
        "worst_overcount": worst_over,
        "slack_eps_n": slack,
        "over_vs_slack": round(worst_over / slack, 4) if slack else None,
        "undercounts": undercounts,
        "n_probes": len(CMS_PROBES),
    }


def audit_snapshot_bloom(spark, sf_dir: str) -> dict:
    """Partition-bloom efficacy at the registered snapshot_bloom_scan
    publish (events bloom-indexed on event_id): for ABSENT probe ids,
    the fraction of partitions the bloom fails to skip (false-positive
    rate).  Correctness never depends on this — a saturated filter only
    stops skipping — but the I/O advice is the operator's point, so its
    decay with per-partition key count is the scale signal."""
    import shutil
    import tempfile

    from datalake2anomali_spark.io.publish import (
        _bloom_may_contain,
        _manifest_bloom_geometry,
        init_table,
        read_manifest,
    )

    e = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.date_format("ts", "yyyy-MM-dd")
    )
    base = (
        "/dev/shm"
        if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK)
        else tempfile.gettempdir()
    )
    root = os.path.join(
        base, "d2a_bloomaudit_" + sf_dir.strip("/").replace("/", "_")
    )
    shutil.rmtree(root, ignore_errors=True)
    init_table(spark, e, root, "event_date", bloom_cols=["event_id"])
    manifest = read_manifest(root)
    blooms = manifest["bloom"]
    m, k = _manifest_bloom_geometry(manifest)
    hi = e.agg(F.max("event_id")).collect()[0][0]
    keys_per_part = (
        e.groupBy("event_date").agg(F.countDistinct("event_id").alias("d"))
    ).agg(F.max("d"), F.avg("d")).collect()[0]
    probes = [int(hi) + 1 + i for i in range(200)]
    tested = fps = 0
    for pval, cols in blooms.items():
        hx = cols.get("event_id")
        if hx is None:
            continue
        for v in probes:
            tested += 1
            if _bloom_may_contain(hx, v, m=m, k=k):
                fps += 1
    shutil.rmtree(root, ignore_errors=True)
    return {
        "gate": "snapshot_bloom_scan",
        "m_bits": m,
        "k": k,
        "partitions": len(blooms),
        "max_keys_per_partition": int(keys_per_part[0]),
        "avg_keys_per_partition": round(float(keys_per_part[1]), 1),
        "absent_probe_fp_rate": round(fps / tested, 4) if tested else None,
        "design_note": "fp_rate≈(1-exp(-k·n/m))^k at n keys/partition",
    }


def audit_bloom_semi_join(spark, sf_dir: str) -> dict:
    """Measured bitmap FPR on the reduced probe side at the registered
    bloom_semi_join config (events probe, selective error-user build
    side, DEFAULT_M_BITS/DEFAULT_K geometry) vs the ~1% design point."""
    from datalake2anomali_spark.operators.bloomjoin import (
        bloom_semi_reduce,
        build_key_bloom,
    )

    e = load_table(spark, sf_dir, "events")
    build = (
        e.filter((F.col("event_type") == "error") & (F.col("user_id") % 13 == 0))
        .select("user_id")
        .distinct()
    )
    n_keys = build.count()
    words = build_key_bloom(build, "user_id")
    reduced = bloom_semi_reduce(e, words, "user_id")
    n_all = e.count()
    n_reduced = reduced.count()
    n_true = e.join(F.broadcast(build), "user_id", "left_semi").count()
    denom = n_all - n_true
    fpr = (n_reduced - n_true) / denom if denom else 0.0
    return {
        "gate": "bloom_semi_join",
        "build_keys": n_keys,
        "rows_all": n_all,
        "rows_reduced": n_reduced,
        "rows_true_match": n_true,
        "measured_fpr": round(fpr, 5),
        "design_fpr": 0.01,
    }


AUDITS = {
    "sketch_stats": audit_sketch_stats,
    "cms_counts": audit_cms_counts,
    "snapshot_bloom_scan": audit_snapshot_bloom,
    "bloom_semi_join": audit_bloom_semi_join,
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(AUDITS)
    unknown = [n for n in names if n not in AUDITS]
    if unknown:
        raise SystemExit(f"unknown gates: {unknown}; known: {sorted(AUDITS)}")
    spark = get_spark("margin_audit")
    for n in names:
        rec = AUDITS[n](spark, sf_dir)
        rec["sf_dir"] = sf_dir
        print(json.dumps(rec), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
