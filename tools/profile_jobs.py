"""Per-query Spark-job-count + wall-time profiler (guide §1: measure first).

Runs each named query (build = the callable, exec = noop write) and reports
how many Spark jobs the driver submitted for each phase plus wall seconds —
the driver-gap diagnostic the r16/r17 optimization rounds steer by.  Job
ids are read from the status tracker under a per-query job group set on the
MAIN driver thread, so the count covers AQE stage-job fan-out exactly BUT
undercounts fixtures that submit jobs from `_overlap`'s worker threads
(thread-local job groups don't inherit across plain pool threads) — for
those rows the wall-clock columns are the signal, not the job counts.

Usage:  python tools/profile_jobs.py <query> [query ...] [--warm N]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from datalake2anomali_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    warm = 1
    if "--warm" in args:
        i = args.index("--warm")
        warm = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = entrymod.queries()
    names = args or list(qs)
    entrymod.entry(spark).count()  # JVM warmup
    st = sc.statusTracker()
    for name in names:
        fn = qs[name]
        for tag in ["cold"] + ["warm"] * warm:
            group = f"prof-{name}-{tag}-{time.monotonic_ns()}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            df = fn(spark, sf_dir)
            t1 = time.time()
            jobs_build = len(st.getJobIdsForGroup(group))
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            jobs_total = len(st.getJobIdsForGroup(group))
            sc.setJobGroup(None, None)
            spark.catalog.clearCache()
            print(
                json.dumps(
                    {
                        "query": name,
                        "pass": tag,
                        "build_sec": round(t1 - t0, 3),
                        "exec_sec": round(t2 - t1, 3),
                        "jobs_build": jobs_build,
                        "jobs_exec": jobs_total - jobs_build,
                    }
                ),
                flush=True,
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
