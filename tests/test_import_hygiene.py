"""Static import-hygiene gate over the whole package.

Round-11 shipped six registered queries that crashed at call time with
``NameError: name 'init_table' is not defined``: a refactor deleted the
name from six functions' local ``from ..io.publish import (...)`` blocks
while their call sites remained.  Runtime gates only see such a bug when
the query actually runs — with the rotation window that can be three
rounds later.  This test catches the whole class statically in
milliseconds: for every function (at any nesting depth) in every module
of ``datalake2anomali_spark/``, ``tools/``, ``tests/``, ``bench.py``
and ``__spark_entry__.py``, any name the function reads from GLOBAL
scope must actually be bound at module level (import, assignment, def,
class — or assigned through an explicit ``global`` declaration in some
function) or be a builtin.  ``symtable`` does the scope resolution, so
locals, closure cells, comprehension targets, lambda args, and
``global`` declarations are all handled by the compiler's own rules
rather than a hand-rolled AST walk.
"""

from __future__ import annotations

import builtins
import os
import symtable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCAN = ["datalake2anomali_spark", "tools", "tests", "__spark_entry__.py", "bench.py"]

# Module-scope dunders are injected by the import machinery, not bound in
# source; they resolve as globals inside functions.
_IMPLICIT = {
    "__name__", "__file__", "__doc__", "__package__", "__spec__",
    "__loader__", "__builtins__", "__path__", "__debug__",
}
_BUILTINS = set(dir(builtins)) | _IMPLICIT


def _py_files():
    for entry in SCAN:
        path = os.path.join(REPO, entry)
        if os.path.isfile(path):
            yield path
            continue
        for dirpath, dirnames, filenames in os.walk(path):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for f in filenames:
                if f.endswith(".py"):
                    yield os.path.join(dirpath, f)


def _module_bindings(table: symtable.SymbolTable) -> set:
    names = {
        s.get_name()
        for s in table.get_symbols()
        if s.is_assigned() or s.is_imported()
    }
    # a `global x; x = ...` inside any function also binds the module
    # name — the module table itself doesn't list it
    def _global_writes(t):
        if t.get_type() == "function":
            for s in t.get_symbols():
                if s.is_declared_global() and s.is_assigned():
                    names.add(s.get_name())
        for c in t.get_children():
            _global_writes(c)

    _global_writes(table)
    return names


def _walk(table, module_names, path, problems):
    if table.get_type() in ("function", "type parameters"):
        for sym in table.get_symbols():
            name = sym.get_name()
            if not sym.is_referenced() or not sym.is_global():
                continue
            if name in module_names or name in _BUILTINS:
                continue
            problems.append(
                f"{os.path.relpath(path, REPO)}:{table.get_lineno()} "
                f"function {table.get_name()!r} reads global {name!r} "
                f"which is not bound at module level"
            )
    for child in table.get_children():
        _walk(child, module_names, path, problems)


def test_every_function_global_resolves():
    problems = []
    n = 0
    for path in _py_files():
        n += 1
        with open(path, encoding="utf-8") as fh:
            src = fh.read()
        top = symtable.symtable(src, path, "exec")
        module_names = _module_bindings(top)
        for child in top.get_children():
            _walk(child, module_names, path, problems)
    assert n > 50, f"hygiene scan only saw {n} files — SCAN roots moved?"
    assert not problems, (
        f"{len(problems)} unresolvable global reads (the round-11 "
        "init_table NameError class):\n" + "\n".join(problems)
    )
