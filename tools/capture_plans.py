"""Capture .explain("formatted") for named queries into plans/r<N>/.

Usage:  python tools/capture_plans.py <round> <before|after> <query> [...]

Runs each query callable (fixtures build eagerly), then writes the
returned DataFrame's formatted physical plan to
``plans/r<round>/<query>_<tag>.txt`` — the judge's plan-claim evidence.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from datalake2anomali_spark.session import get_spark  # noqa: E402


def main() -> int:
    rnd, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    assert tag in ("before", "after"), tag
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    outdir = os.path.join(REPO, "plans", f"r{rnd}")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plans")
    qs = entrymod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
