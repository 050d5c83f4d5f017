"""Compare two bench JSON records per-query.

    python tools/bench_compare.py OLD.json NEW.json [--warm] [--top N]

Prints the common-query ratio (sum_new / sum_old over queries present in
BOTH records — the cross-round comparable number) and the N worst
per-query drifts.  Rows under 0.5 s in both records are summed into the
ratio but suppressed from the drift list (sub-second absolute noise).
"""

from __future__ import annotations

import argparse
import json


def _load(path: str, warm: bool) -> dict[str, float]:
    with open(path, encoding="utf-8") as fh:
        rec = json.load(fh)
    key = "queries_warm" if warm else "queries"
    out = rec.get(key) or {}
    if not out:
        raise SystemExit(f"{path} has no {key!r}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_record")
    ap.add_argument("new_record")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--top", type=int, default=10)
    ns = ap.parse_args()
    warm, top = ns.warm, ns.top
    old, new = _load(ns.old_record, warm), _load(ns.new_record, warm)
    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries")
    s_old = sum(old[q] for q in common)
    s_new = sum(new[q] for q in common)
    tag = "warm" if warm else "cold"
    print(
        f"common {len(common)} queries ({tag}): {s_new:.1f}s vs {s_old:.1f}s "
        f"= {s_new / s_old:.3f}x"
    )
    drifts = [
        (new[q] / old[q], q, old[q], new[q])
        for q in common
        if old[q] > 0 and (old[q] >= 0.5 or new[q] >= 0.5)
    ]
    for ratio, q, o, n in sorted(drifts, reverse=True)[:top]:
        print(f"  {ratio:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): " + ", ".join(only_new))


if __name__ == "__main__":
    main()
