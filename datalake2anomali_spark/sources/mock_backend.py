"""Deterministic in-process stand-ins for the two remote services.

The reference talks to real HTTPS endpoints (Datalake bulk search,
WorldWatch advisories); this container has no network, so the engine's
DataSources delegate to this module instead — a pure function of
(query_hash, row index), importable from executor worker processes, no
shared state.  Everything a real backend would do server-side (the saved
query, the projection, the ``updated_after`` cursor) has an explicit hook
here so the DataSources exercise real pushdown paths.

Shapes mirror the reference wire formats:

- bulk search (``/root/reference/src/Datalake2Anomali.py:327-343``):
  ``{count, advanced_query_hash, results: [[atom_type, atom_value, md5,
  threat_scores, tags?], ...]}`` — positional arrays, md5 nullable, tags
  present only when requested.
- advisories (``:409-430``): ``{id, title, timestamp_created,
  timestamp_updated, tags}`` with ``%Y-%m-%dT%H:%M:%SZ`` timestamps, plus
  a per-id ``html`` detail fetch.
"""

from __future__ import annotations

import hashlib
import json
from datetime import datetime, timedelta, timezone

ATOM_TYPES = ["fqdn", "domain", "ip", "url", "email", "file", "cve", "paste"]
# cve/paste have no DTL_TO_ANOMALI_TYPE entry -> exercise the F2 discard.

DEFAULT_FIELDS = ["atom_type", "atom_value", ".hashes.md5", "threat_scores"]

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _h(key: str) -> int:
    return int.from_bytes(hashlib.sha256(key.encode()).digest()[:8], "big")


def result_count(query_hash: str) -> int:
    return 50 + _h(f"{query_hash}/n") % 150


def _row(query_hash: str, i: int, fields: list[str]) -> list:
    """One positional result row, projected to ``fields`` in order."""
    seed = _h(f"{query_hash}/{i}")
    atom_type = ATOM_TYPES[seed % len(ATOM_TYPES)]
    values = {
        "atom_type": atom_type,
        "atom_value": f"{atom_type}-{seed % 100000}.example",
        ".hashes.md5": (
            hashlib.md5(f"{query_hash}/{i}".encode()).hexdigest()
            if atom_type == "file" and seed % 5 != 0
            else None  # every 5th file atom lacks an md5 -> exercises F3
        ),
        "threat_scores": [(seed >> s) % 100 for s in (8, 16, 24)],
        "tags": [f"tag{seed % 7}", f"campaign{seed % 3}"],
    }
    return [values[f] for f in fields]


def bulk_search(
    query_hash: str,
    query_fields: list[str] | None = None,
    atom_type_eq: str | None = None,
) -> dict:
    """SRC1: the saved-query download.  ``query_fields`` is the projection
    the client pushes (SRC2); ``atom_type_eq`` models an extra server-side
    predicate (what ``pushFilters`` forwards)."""
    fields = query_fields or DEFAULT_FIELDS
    rows = [_row(query_hash, i, fields) for i in range(result_count(query_hash))]
    if atom_type_eq is not None and "atom_type" in fields:
        k = fields.index("atom_type")
        rows = [r for r in rows if r[k] == atom_type_eq]
    return {
        "count": len(rows),
        "advanced_query_hash": query_hash,
        "results": rows,
    }


def bulk_search_json_rows(
    query_hash: str,
    query_fields: list[str] | None = None,
    atom_type_eq: str | None = None,
):
    """The same download, one JSON string per positional row — the shape
    :func:`..ioc.transforms.parse_positional` consumes."""
    for row in bulk_search(query_hash, query_fields, atom_type_eq)["results"]:
        yield json.dumps(row)


N_ADVISORIES = 40


def advisories(updated_after: str | None = None) -> list[dict]:
    """SRC4: the advisory list; ``updated_after`` filters server-side."""
    out = []
    for i in range(N_ADVISORIES):
        seed = _h(f"adv/{i}")
        created = _EPOCH + timedelta(hours=6 * i)
        updated = created + timedelta(hours=seed % 72)
        item = {
            "id": i,
            "title": f"WorldWatch advisory {i}",
            "timestamp_created": created.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "timestamp_updated": updated.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "tags": [f"sector{seed % 5}", f"region{seed % 3}"],
        }
        if updated_after is None or item["timestamp_updated"] > updated_after:
            out.append(item)
    return out


def advisory_html(advisory_id: int) -> str:
    """SRC5: the per-advisory detail fetch (the N+1 enrichment)."""
    return f"<html><body>advisory {advisory_id} body {_h(f'html/{advisory_id}') % 10**6}</body></html>"
