"""Mandatory pre-commit gate (VERDICT r11 task 2b).

Run before EVERY commit::

    python tools/precommit_check.py

Always runs the millisecond static layers (import hygiene + entry
contract import).  If the staged-or-unstaged diff touches ``plans/`` or
``io/publish.py`` — the blast radius of the round-11 six-query
NameError — it additionally runs ``tests/test_plan_shapes.py``, which
builds/executes every registered query (~4 min) and is the test that
would have caught commit 69914d9 before it shipped.  Exit code 0 =
safe to commit.
"""

from __future__ import annotations

import subprocess
import sys

REPO = "/root/repo"


def _sh(args: list) -> "subprocess.CompletedProcess":
    return subprocess.run(args, cwd=REPO, capture_output=True, text=True)


def _changed_files() -> set:
    out = set()
    for args in (
        ["git", "diff", "--name-only"],
        ["git", "diff", "--name-only", "--cached"],
    ):
        r = _sh(args)
        out.update(line.strip() for line in r.stdout.splitlines() if line.strip())
    return out


def main() -> int:
    steps = [["python", "-m", "pytest", "tests/test_import_hygiene.py",
              "tests/test_entry_contract.py::test_every_query_has_oracle_or_documented_exception",
              "-q", "--no-header"]]
    changed = _changed_files()
    hot = [
        f for f in changed
        if f.startswith("datalake2anomali_spark/plans/")
        or f == "datalake2anomali_spark/io/publish.py"
        or f == "__spark_entry__.py"
    ]
    if hot:
        print(f"plan-affecting diff ({len(hot)} files) -> running plan-shape build of every registered query")
        steps.append(["python", "-m", "pytest", "tests/test_plan_shapes.py", "-q", "--no-header"])
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
