"""Mandatory pre-commit gate (VERDICT r11 task 2b).

Run before EVERY commit::

    python tools/precommit_check.py

Always runs the millisecond static layers (import hygiene + entry
contract).  If the diff — staged, unstaged, or untracked — touches
``plans/``, any ``io/`` module the plan fixtures import at call time,
or the entry module, it additionally runs ``tests/test_plan_shapes.py``,
which builds/executes every registered query (~4 min) and is the test
that would have caught commit 69914d9 before it shipped.  Exit code 0 =
safe to commit.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _base_ref() -> str | None:
    """Base ref for the committed-but-unpublished span of the diff.

    Working-tree-only diffs miss work that was already committed (an
    accidental early commit, or running the gate before ``git commit
    --amend``) — the gate would then see an empty diff and silently skip
    the expensive plan-shape layer it exists for (ADVICE r12).  Default
    to ``@{upstream}`` when one is configured; override with
    ``PRECOMMIT_BASE=<ref>`` for repos (like this one) with no remote.
    """
    env = os.environ.get("PRECOMMIT_BASE")
    if env:
        return env
    r = subprocess.run(
        ["git", "rev-parse", "--abbrev-ref", "--symbolic-full-name", "@{upstream}"],
        cwd=REPO, capture_output=True, text=True,
    )
    return r.stdout.strip() if r.returncode == 0 else None


def _changed_files() -> set | None:
    """Files the diff touches, or None when the scan itself failed and
    coverage is unknown (the caller must then run the full gate — an
    empty set after a git failure would silently skip the plan-shape
    layer, the exact hole this scan exists to close)."""
    out = set()
    scan_failed = False
    cmds = [
        ["git", "diff", "--name-only"],
        ["git", "diff", "--name-only", "--cached"],
        ["git", "ls-files", "--others", "--exclude-standard"],
    ]
    base = _base_ref()
    span_cmd = None
    if base:
        # three-dot: merge-base..HEAD — two-dot would pull upstream-only
        # files into the hot set when the remote is ahead
        span_cmd = ["git", "diff", "--name-only", f"{base}...HEAD"]
        cmds.append(span_cmd)
    else:
        print("note: no @{upstream}/PRECOMMIT_BASE — hot-file scan covers the "
              "working tree only (committed-but-unpublished work unseen)")
    for args in cmds:
        r = subprocess.run(args, cwd=REPO, capture_output=True, text=True)
        if r.returncode != 0:
            msg = (
                f"precommit gate: `{' '.join(args)}` failed "
                f"(rc={r.returncode}): {r.stderr.strip()}"
            )
            # Only the base-ref SPAN command hard-exits: a typo'd
            # PRECOMMIT_BASE silently reproduces the plan-shape skip the
            # widening exists to prevent (code-review r13).  The three
            # always-on commands can fail benignly (unborn HEAD in a
            # fresh repo, shallow clones) — stay loud, keep going, but
            # mark coverage unknown so the caller runs the FULL gate
            # rather than treating "saw nothing" as "nothing changed"
            # (ADVICE r13 + code-review r14).
            if args is span_cmd:
                raise SystemExit(msg)
            print("warning:", msg, file=sys.stderr)
            scan_failed = True
            continue
        out.update(line.strip() for line in r.stdout.splitlines() if line.strip())
    return None if scan_failed else out


def _plan_layer_reason(changed: set | None) -> str | None:
    """Why the expensive plan-shape layer must run, or None to skip it.

    ``changed is None`` means the hot-file scan itself failed — coverage
    is UNKNOWN, so the layer runs conservatively (treating it like an
    empty set would restore the silent skip; code-review r14).  The
    plan fixtures lazily import io/, operators/, llm/, ioc/, sources/,
    functions/ and streaming/ at call time, so a symbol rename ANYWHERE
    in the package breaks registered queries exactly like the round-11
    NameError — the whole package is hot.
    """
    if changed is None:
        return "hot-file scan FAILED (coverage unknown)"
    hot = [
        f for f in changed
        if f.startswith("datalake2anomali_spark/")
        or f == "__spark_entry__.py"
    ]
    return f"plan-affecting diff ({len(hot)} files)" if hot else None


def main() -> int:
    steps = [[sys.executable, "-m", "pytest", "tests/test_import_hygiene.py",
              "tests/test_entry_contract.py",
              "-q", "--no-header"]]
    reason = _plan_layer_reason(_changed_files())
    if reason:
        print(f"{reason} -> running the plan-shape build of every "
              "registered query")
        steps.append(
            [sys.executable, "-m", "pytest", "tests/test_plan_shapes.py",
             "-q", "--no-header"]
        )
    else:
        # visible skip (ADVICE r12): an empty hot set must be a statement,
        # not silence, so a gate run that missed committed work is auditable
        print("no plan-affecting files in the diff -> SKIPPING the "
              "plan-shape layer (set PRECOMMIT_BASE to widen the scan)")
    for args in steps:
        print("+", " ".join(args), flush=True)
        r = subprocess.run(args, cwd=REPO)
        if r.returncode != 0:
            print("PRECOMMIT GATE FAILED — do not commit", file=sys.stderr)
            return r.returncode
    print("precommit gate green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
