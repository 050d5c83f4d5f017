"""Pins for the precommit gate's hot-file scan (ADVICE r12 +
code-review r13): the committed-span widening must fail LOUDLY on a bad
base ref — swallowing the git error reproduces the silent plan-shape
skip the widening exists to prevent.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "precommit_check",
    os.path.join(os.path.dirname(__file__), "..", "tools", "precommit_check.py"),
)
pc = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pc)


def test_bad_base_ref_fails_the_gate(monkeypatch):
    monkeypatch.setenv("PRECOMMIT_BASE", "no-such-ref-xyz")
    with pytest.raises(SystemExit) as exc:
        pc._changed_files()
    assert "no-such-ref-xyz" in str(exc.value)


def test_valid_base_ref_widens_the_scan(monkeypatch):
    import subprocess

    # HEAD~1 is unresolvable in a depth-1 shallow clone or a
    # single-commit repo — that environment can't exercise the widening
    # at all, so skip rather than fail loudly (ADVICE r13)
    probe = subprocess.run(
        ["git", "rev-parse", "--verify", "HEAD~1"],
        cwd=pc.REPO, capture_output=True, text=True,
    )
    if probe.returncode != 0:
        pytest.skip("HEAD~1 unresolvable (shallow or single-commit repo)")
    monkeypatch.setenv("PRECOMMIT_BASE", "HEAD~1")
    files = pc._changed_files()  # must not raise
    assert isinstance(files, set)
    # the span diff contributed: HEAD~1...HEAD is nonempty in this repo
    span = subprocess.run(
        ["git", "diff", "--name-only", "HEAD~1...HEAD"],
        cwd=pc.REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    assert set(span) <= files


def test_no_base_is_a_visible_note_not_an_error(monkeypatch, capsys):
    monkeypatch.delenv("PRECOMMIT_BASE", raising=False)
    if pc._base_ref() is not None:
        pytest.skip("repo has an upstream configured")
    pc._changed_files()
    assert "working tree only" in capsys.readouterr().out


def test_scan_failure_means_unknown_coverage_not_empty(monkeypatch):
    """If an always-on git command fails, _changed_files must return
    None (coverage unknown) and the gate must run the full plan-shape
    layer — an empty set after a git failure is the silent skip the
    gate exists to prevent (code-review r14)."""
    import subprocess as sp

    real_run = sp.run

    def failing_run(args, **kw):
        if args[:2] == ["git", "diff"] or args[:2] == ["git", "ls-files"]:
            class R:
                returncode = 128
                stdout = ""
                stderr = "fatal: simulated index failure"
            return R()
        return real_run(args, **kw)

    # neutralize any configured upstream: with one, the span command
    # would be appended and its simulated failure correctly raises
    # SystemExit instead of returning None (code-review r14 re-review)
    monkeypatch.setattr(pc, "_base_ref", lambda: None)
    monkeypatch.setattr(pc.subprocess, "run", failing_run)
    assert pc._changed_files() is None
    # and the decision layer treats unknown coverage as "run everything"
    assert pc._plan_layer_reason(None)
    assert pc._plan_layer_reason(set()) is None
    assert pc._plan_layer_reason({"docs/x.md"}) is None
    assert pc._plan_layer_reason({"datalake2anomali_spark/io/publish.py"})
