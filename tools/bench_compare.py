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


def _load(path: str, warm: bool) -> dict:
    with open(path, encoding="utf-8") as fh:
        rec = json.load(fh)
    key = "queries_warm" if warm else "queries"
    out = rec.get(key) or {}
    if not out:
        raise SystemExit(f"{path} has no {key!r}")
    return rec


def _split(rec: dict, warm: bool, loop: set) -> tuple[dict, dict] | None:
    """(build, exec) per-query maps when the record carries the r14
    fixture/operator split; None for pre-r14 records.  Rows named in
    ``loop`` (the r16 ``operator_loop`` tag: iterative operators whose
    driver loop runs inside the query callable) have their build bucket
    folded into exec, so the exec drift gate covers the operator work
    instead of mislabeling it fixture scripting (VERDICT r15 task 3)."""
    pfx = "queries_warm" if warm else "queries"
    b, e = rec.get(pfx + "_build"), rec.get(pfx + "_exec")
    if not (b and e):
        return None
    b, e = dict(b), dict(e)
    for q in loop:
        if q in b and q in e:
            e[q] = round(e[q] + b[q], 3)
            b[q] = 0.0
    return (b, e)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old_record")
    ap.add_argument("new_record")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("--top", type=int, default=10)
    ns = ap.parse_args()
    warm, top = ns.warm, ns.top
    rec_old, rec_new = _load(ns.old_record, warm), _load(ns.new_record, warm)
    key = "queries_warm" if warm else "queries"
    old, new = rec_old[key], rec_new[key]
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
    # When both records carry the r14 fixture/operator split, diff the
    # two components separately: a drift whose delta sits entirely in the
    # build bucket is fixture scripting, not operator throughput, and
    # needs no standalone A/B adjudication (VERDICT r13 task 3).  The
    # operator_loop tag is taken from EITHER record (a pre-r16 old record
    # lacks it) and applied to both, so the components stay comparable.
    loop = set(rec_old.get("operator_loop") or []) | set(
        rec_new.get("operator_loop") or []
    )
    if loop:
        print(f"operator-loop rows folded into exec: {len(loop)}")
    sp_old, sp_new = _split(rec_old, warm, loop), _split(rec_new, warm, loop)
    if sp_old and sp_new:
        for label, o_map, n_map in (
            ("build", sp_old[0], sp_new[0]),
            ("exec", sp_old[1], sp_new[1]),
        ):
            both = [q for q in common if q in o_map and q in n_map]
            so = sum(o_map[q] for q in both)
            sn = sum(n_map[q] for q in both)
            ratio = sn / so if so else float("inf")
            print(f"  {label} component: {sn:.1f}s vs {so:.1f}s = {ratio:.3f}x")
    drifts = [
        (new[q] / old[q], q, old[q], new[q])
        for q in common
        if old[q] > 0 and (old[q] >= 0.5 or new[q] >= 0.5)
    ]
    for ratio, q, o, n in sorted(drifts, reverse=True)[:top]:
        extra = ""
        if (
            sp_old
            and sp_new
            and all(q in m for m in (*sp_old, *sp_new))
        ):
            extra = (
                f"  [build {sp_old[0][q]:.2f}->{sp_new[0][q]:.2f}"
                f" exec {sp_old[1][q]:.2f}->{sp_new[1][q]:.2f}]"
            )
        print(f"  {ratio:5.2f}x  {q}: {o:.2f}s -> {n:.2f}s{extra}")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"new-only ({len(only_new)}): " + ", ".join(only_new))


if __name__ == "__main__":
    main()
