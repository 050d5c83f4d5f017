"""Python UDTFs (table functions) — the Spark 4 surface for row→rows
transforms no built-in generator expresses.

``explode``/``posexplode``/``inline`` cover typed arrays and
``from_json`` covers KNOWN schemas; what they cannot do is schema-on-read
over heterogeneous semi-structured payloads — "give me every leaf of
whatever JSON this row carries".  :class:`JsonFlatten` is that escape
hatch: it walks arbitrarily nested objects/arrays and emits one row per
scalar leaf as (JSONPath, canonical-JSON leaf text).  Downstream this is
the schema-discovery / property-mining primitive (count paths, profile
types, promote hot paths to real columns).

Scale notes: UDTFs are the Python slow path — per-partition processes fed
in Arrow batches (``useArrow=True``); keep them off hot paths where a
JVM expression works (the module docstring of ``llm/text.py`` makes the
same argument for pandas_udfs).  The walk is row-local, so the operator
is embarrassingly parallel with zero shuffle; output order within a row
is deterministic (dict order = JSON document order in Python).

Leaves are serialized with ``json.dumps`` so the text matches what SQL
``json_extract`` returns for the same path (numbers bare, strings
quoted, ``true``/``false``/``null`` lowercase) — that textual contract is
what lets an independent DuckDB ``json_keys``+``json_extract`` oracle
hash-match the UDTF's output.
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(returnType="path string, leaf string", useArrow=True)
class JsonFlatten:
    """(path, leaf) per scalar leaf of the JSON document; NULL/corrupt
    input yields no rows (PERMISSIVE-style skip — a strict variant would
    route the raw text to a side output, as io/jsonl.py does)."""

    def eval(self, js: str):  # noqa: D102 - contract in class docstring
        if js is None:
            return
        try:
            obj = json.loads(js)
        except ValueError:
            return
        yield from _walk(obj, "$")


def _walk(node, path: str):
    if isinstance(node, dict):
        for k, v in node.items():
            yield from _walk(v, f"{path}.{k}")
    elif isinstance(node, list):
        for i, v in enumerate(node):
            yield from _walk(v, f"{path}[{i}]")
    else:
        yield (path, json.dumps(node))


def register_udtfs(spark) -> None:
    """Idempotently register the module's UDTFs for SQL use."""
    spark.udtf.register("json_flatten", JsonFlatten)
