"""Driver-gate window invariants for __spark_entry__.py.

The driver's correctness gate checks exactly the FIRST 50 registered
queries (observed rounds 2-6).  With more registrations than twice the
window, the invariant (VERDICT r6 #1) is a machine-checked staleness
bound: a query last certified in round L must re-enter the window no
later than round L + staleness_bound, and a query with no driver row yet
must always be in-window.  ``docs/rotation_ledger.json`` records the
per-query state; ``tools/rotation_ledger.py`` re-derives it from the
committed CORRECTNESS_r*.json evidence, so a new round's evidence file
landing in git makes these tests fail until the rotation chore is done.
"""

from __future__ import annotations

import json
import os

import __spark_entry__ as entrymod
from tools.rotation_ledger import LEDGER_PATH, build_ledger

GATE_WINDOW = 50


def test_window_overflow_is_exactly_the_tail():
    ordered = list(entrymod.queries())
    assert len(ordered) > GATE_WINDOW, "fewer registrations than the gate window"
    assert len(ordered) - GATE_WINDOW == len(entrymod._TAIL), (
        f"{len(ordered)} registered − {GATE_WINDOW} window ≠ {len(entrymod._TAIL)} "
        "tail entries; the overflow must be exactly _TAIL or an undocumented "
        "query silently falls out of the checked window"
    )
    assert ordered[GATE_WINDOW:] == list(entrymod._TAIL)


def test_priority_lands_inside_the_window():
    ordered = list(entrymod.queries())
    window = set(ordered[:GATE_WINDOW])
    missing = [n for n in entrymod._PRIORITY if n not in window]
    assert not missing, f"_PRIORITY entries outside the checked window: {missing}"


def test_priority_and_tail_are_registered_and_disjoint():
    names = set(entrymod.queries())
    for group in (entrymod._PRIORITY, entrymod._TAIL):
        unknown = [n for n in group if n not in names]
        assert not unknown, f"unregistered names: {unknown}"
        assert len(set(group)) == len(group), "duplicate names in ordering tuple"
    overlap = set(entrymod._PRIORITY) & set(entrymod._TAIL)
    assert not overlap, f"_PRIORITY ∩ _TAIL must be empty: {overlap}"


def test_staleness_ledger_matches_committed_evidence():
    """The committed ledger must equal the derivation from CORRECTNESS files.

    When the driver lands a new CORRECTNESS_r{N}.json, this fails until
    tools/rotation_ledger.py is rerun — the forcing function for the
    per-round rotation chore.
    """
    assert os.path.exists(LEDGER_PATH), "docs/rotation_ledger.json missing"
    with open(LEDGER_PATH) as fh:
        committed = json.load(fh)
    assert committed == build_ledger(), (
        "rotation ledger stale — rerun tools/rotation_ledger.py and rotate "
        "_PRIORITY/_TAIL for the new round"
    )


def test_staleness_bound_is_satisfied_by_the_window():
    """Every query at its certification deadline must be inside the window."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    bound = ledger["staleness_bound"]
    next_round = ledger["next_round"]
    window = set(list(entrymod.queries())[:GATE_WINDOW])
    overdue = []
    for name, st in ledger["queries"].items():
        last = st["last_certified"]
        if last is None:
            # never certified: first exposure cannot be deferred at all
            if name not in window:
                overdue.append(f"{name} (never certified, registered r{st['registered']})")
        elif next_round >= last + bound and name not in window:
            overdue.append(f"{name} (last certified r{last}, deadline r{last + bound})")
    assert not overdue, (
        f"queries past their staleness deadline are outside the round-"
        f"{next_round} gate window: {overdue}"
    )


def test_staleness_bound_is_satisfiable():
    """The set of mandatory in-window queries must fit the window."""
    with open(LEDGER_PATH) as fh:
        ledger = json.load(fh)
    bound = ledger["staleness_bound"]
    next_round = ledger["next_round"]
    mandatory = [
        name
        for name, st in ledger["queries"].items()
        if st["last_certified"] is None or next_round >= st["last_certified"] + bound
    ]
    assert len(mandatory) <= GATE_WINDOW, (
        f"{len(mandatory)} mandatory entries exceed the {GATE_WINDOW}-row window; "
        "pause registrations or raise the bound honestly"
    )


def test_every_query_has_oracle_or_documented_exception():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert list(qs)[: len(oracles)] is not None
    missing = [n for n in qs if n not in oracles]
    # genuinely non-SQL-expressible ops may omit the oracle (driver then
    # records a weaker rows-only check); keep that list explicit and empty
    assert missing == [], f"queries without a DuckDB oracle twin: {missing}"
    extra = [n for n in oracles if n not in qs]
    assert extra == [], f"oracles without a registered query: {extra}"
