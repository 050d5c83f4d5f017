"""Hidden partitioning: Iceberg-style partition transforms over the
versioned table (:mod:`.publish`).

The lakehouse ergonomics problem at 100 TB: hive-style layouts make the
LAYOUT part of the query contract — users must filter on the derived
``event_date`` column or lose pruning, and changing the layout breaks
every query.  Iceberg's answer is *hidden* partitioning: the table
records a TRANSFORM from a source column to a partition value
(``days(ts)``, ``bucket(16, user_id)``, ``truncate(100, col)``), writers
derive it mechanically, and readers keep filtering on the SOURCE column
— the engine maps source predicates to partition pruning through the
recorded transform.  This module is that contract on top of
:func:`..publish.init_table` / :func:`..publish.read_snapshot`:

- The transform spec is stored next to the manifest
  (``_PARTITION_SPEC.json``), so the layout is table metadata, not query
  text.
- Writer-side derivation and reader-side pruning share one definition
  per transform; ``bucket`` hashes via the same first-15-hex-chars-of-md5
  scheme as the manifest bloom filters, so the pure-Python reader probe
  agrees bit-for-bit with the Spark writer expression.
- Pruning is advisory-safe by construction: ``may_match`` must only
  reject a partition that provably cannot hold a matching row, and the
  source-column row filter is ALWAYS applied — so a wrong spec can cost
  I/O, never correctness (pinned by the result-equality tests).

Supported predicates: ``("between", col, lo, hi)`` for ``days``/
``hours`` (bounds in epoch microseconds) and ``truncate`` (native
units); ``("eq", col, value)`` for every transform.  Predicates on any
other column fall back to a full (unpruned) snapshot read with the row
filter applied.

**Partition-spec evolution** (:func:`evolve_partition_spec`) changes the
layout for FUTURE writes without touching a byte of existing data —
Iceberg's headline ergonomic.  Each partition value carries its spec
generation (``g{i}:`` prefix; generation 0, the creation spec, stays
unprefixed for compatibility), the spec file records the full generation
list, and the reader prunes each partition under the transform that
wrote it: a predicate on one generation's source column prunes that
generation's partitions and conservatively reads the others (the
always-applied row filter keeps results exact — same advisory-safe
contract as single-spec pruning).

Reference parity: none — extension (table-format family, alongside
zone maps / bloom skipping / time travel in ``publish.py``).
"""

from __future__ import annotations

import hashlib
import json
import os
import re
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .publish import init_table, read_snapshot

SPEC_FILE = "_PARTITION_SPEC.json"
#: Hidden partition column name (never part of the user-facing schema).
HIDDEN_COL = "_p"

_US_PER_DAY = 86_400_000_000
_US_PER_HOUR = 3_600_000_000


def _components(spec: list) -> list[list]:
    """A spec normalized to its transform components: a single transform
    (``["days", "ts"]``) or a multi-transform spec
    (``[["days", "ts"], ["bucket", 8, "user_id"]]`` — Iceberg's
    multi-field partition spec).  Multi components join with ``"|"`` in
    the stored partition value; no transform's rendering can contain the
    separator (dates, integers)."""
    if spec and isinstance(spec[0], (list, tuple)):
        return [list(c) for c in spec]
    return [list(spec)]


def _spec_source(comp: list) -> str:
    return comp[1] if comp[0] in ("days", "hours") else comp[2]


def transform_column(spec: list):
    """The Spark expression deriving the hidden partition value (multi
    specs concatenate their components with ``"|"``)."""
    comps = _components(spec)
    if len(comps) > 1:
        return F.concat_ws("|", *[transform_column(c) for c in comps])
    spec = comps[0]
    kind = spec[0]
    if kind == "days":
        return F.date_format(F.col(spec[1]), "yyyy-MM-dd")
    if kind == "hours":
        return F.date_format(F.col(spec[1]), "yyyy-MM-dd-HH")
    if kind == "truncate":
        w, col = int(spec[1]), spec[2]
        return (F.floor(F.col(col) / F.lit(w)) * w).cast("long").cast("string")
    if kind == "bucket":
        n, col = int(spec[1]), spec[2]
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", F.col(col).cast("string"), F.lit("b"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n),
        ).cast("string")
    raise ValueError(f"unknown partition transform {kind!r}")


def bucket_of(value, n: int) -> int:
    """Pure-Python twin of the ``bucket`` writer expression."""
    return int(hashlib.md5(f"{value}:b".encode()).hexdigest()[:15], 16) % n


def _day_bounds_us(pval: str, hourly: bool) -> tuple[int, int]:
    fmt = "%Y-%m-%d-%H" if hourly else "%Y-%m-%d"
    start = datetime.strptime(pval, fmt).replace(tzinfo=timezone.utc)
    width = timedelta(hours=1) if hourly else timedelta(days=1)
    lo = int(start.timestamp() * 1_000_000)
    hi = int((start + width).timestamp() * 1_000_000)
    return lo, hi  # [lo, hi)


def may_match(spec: list, pval: str, predicate: tuple) -> bool:
    """Could partition ``pval`` hold a row satisfying ``predicate``?
    Only a definitive NO skips the partition (advisory-safe).  A multi
    spec splits the stored value into its components and rejects iff ANY
    component definitively rejects (the components are ANDed by the
    layout, so one definitive miss rules the partition out)."""
    comps = _components(spec)
    if len(comps) > 1:
        parts = pval.split("|")
        if len(parts) != len(comps):
            return True  # malformed/foreign value: read conservatively
        return all(
            _component_may_match(c, p, predicate)
            for c, p in zip(comps, parts)
        )
    return _component_may_match(comps[0], pval, predicate)


def _component_may_match(spec: list, pval: str, predicate: tuple) -> bool:
    kind = spec[0]
    src = _spec_source(spec)
    if predicate[1] != src:
        return True  # predicate on another column: cannot prune
    if predicate[0] == "eq":
        val = predicate[2]
        if kind in ("days", "hours"):
            lo, hi = _day_bounds_us(pval, kind == "hours")
            return lo <= int(val) < hi
        if kind == "truncate":
            w = int(spec[1])
            p = int(pval)
            return p <= int(val) < p + w
        return pval == str(bucket_of(val, int(spec[1])))
    if predicate[0] == "between":
        _, _, lo_q, hi_q = predicate
        if kind in ("days", "hours"):
            lo, hi = _day_bounds_us(pval, kind == "hours")
            return hi > int(lo_q) and lo <= int(hi_q)
        if kind == "truncate":
            w = int(spec[1])
            p = int(pval)
            return p + w > int(lo_q) and p <= int(hi_q)
        return True  # bucket cannot serve range predicates
    raise ValueError(f"unknown predicate kind {predicate[0]!r}")


#: Source-column types whose Python ``str(value)`` and Spark
#: ``CAST(col AS STRING)`` renderings agree — the same contract as
#: ``publish._validate_bloom_cols``, which this md5 bucket scheme shares.
_BUCKET_SAFE_TYPES = ("tinyint", "smallint", "int", "bigint", "string", "date")
_TRUNCATE_SAFE_TYPES = ("tinyint", "smallint", "int", "bigint")


def _validate_transform_source(df, spec: list) -> None:
    """Refuse transform source columns whose rendering (bucket) or
    arithmetic (truncate) diverges between the Spark writer expression
    and the pure-Python reader probe (ADVICE r7): a bucket over a
    boolean/float/timestamp column hashes ``'True'`` writer-side vs
    ``'true'`` probe-side, so ``may_match`` definitively rejects the
    CORRECT partition and the read silently drops rows — breaking the
    module's advisory-safe contract.  Same failure mode and safe list as
    ``publish._validate_bloom_cols``."""
    _validate_transform_source_types(dict(df.dtypes), spec)


def _validate_transform_source_types(dtypes: dict[str, str], spec: list) -> None:
    for comp in _components(spec):
        kind = comp[0]
        if kind == "days" or kind == "hours":
            src, safe = comp[1], ("timestamp", "timestamp_ntz", "date")
        elif kind == "bucket":
            src, safe = comp[2], _BUCKET_SAFE_TYPES
        elif kind == "truncate":
            src, safe = comp[2], _TRUNCATE_SAFE_TYPES
        else:
            raise ValueError(f"unknown partition transform {kind!r}")
        dtype = dtypes.get(src)
        if dtype is None:
            raise ValueError(
                f"transform source column {src!r} not in dataframe"
            )
        if dtype not in safe:
            raise ValueError(
                f"{kind} transform over {src!r} ({dtype}) is unsupported: "
                f"the writer expression and the reader pruning probe agree "
                f"only for {safe} source columns"
            )


def _require_utc_for_time_transform(spark: SparkSession, spec: list) -> None:
    """days/hours pruning computes partition bounds in UTC while the
    writer renders partition values in the SESSION timezone; under any
    other timezone may_match would wrongly reject partitions and drop
    rows — refuse loudly instead (the project session pins UTC)."""
    if any(c[0] in ("days", "hours") for c in _components(spec)):
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT"):
            raise ValueError(
                f"time partition transforms require a UTC session "
                f"(spark.sql.session.timeZone={tz!r}); pruning bounds are "
                "computed in UTC and would diverge from the written layout"
            )


def init_hidden_table(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    spec: list,
    **init_kwargs,
) -> None:
    """Publish ``df`` as a versioned table hidden-partitioned by
    ``spec`` — a single transform (``["days", "ts"]``, ``["bucket", 16,
    "user_id"]``, ``["truncate", 100, "event_id"]``) or a multi-field
    spec (``[["days", "ts"], ["bucket", 8, "user_id"]]`` — Iceberg's
    composite layout; predicates on EITHER source column prune their
    component).  The derived column never leaks into reads."""
    _require_utc_for_time_transform(spark, list(spec))
    _validate_transform_source(df, list(spec))
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, SPEC_FILE), "w", encoding="utf-8") as fh:
        json.dump(list(spec), fh)
    init_table(
        spark,
        df.withColumn(HIDDEN_COL, transform_column(spec)),
        root,
        HIDDEN_COL,
        **init_kwargs,
    )


def read_spec(root: str) -> list:
    """The CURRENT (latest-generation) partition spec — what new writes
    derive their layout from."""
    return _load_generations(root)[-1]


def _load_generations(root: str) -> list[list]:
    """All spec generations, oldest first.  The creation-era file format
    (a bare spec list) reads as a single generation 0."""
    with open(os.path.join(root, SPEC_FILE), encoding="utf-8") as fh:
        raw = json.load(fh)
    if isinstance(raw, dict):
        return [list(s) for s in raw["generations"]]
    return [list(raw)]


_GEN_PREFIX = re.compile(r"^g(\d+):")


def _gen_of(pval: str) -> tuple[int, str]:
    """(generation, raw transform value) of a stored partition value.
    Generation 0 values are unprefixed (creation-format compatibility)."""
    m = _GEN_PREFIX.match(pval)
    if m:
        return int(m.group(1)), pval[m.end():]
    return 0, pval


def _writer_column(generations: list[list]):
    """The Spark expression deriving the stored partition value under the
    CURRENT generation — prefixed with ``g{i}:`` for every generation
    past the creation spec."""
    i = len(generations) - 1
    expr = transform_column(generations[i])
    if i == 0:
        return expr
    return F.concat(F.lit(f"g{i}:"), expr)


def may_match_multi(
    generations: list[list], pval: str, predicate: tuple
) -> bool:
    """Generation-aware pruning probe: a partition is judged under the
    transform that WROTE it; values from an unknown (newer) generation
    are conservatively read.  Only a definitive NO skips — the same
    advisory-safe contract as :func:`may_match`.

    Unit guard: when ANY generation time-transforms the predicate
    column, :func:`read_hidden`'s contract makes the predicate values
    epoch-microseconds — a domain a bucket/truncate generation over the
    SAME column cannot probe (its writer hashed/floored the native
    value, e.g. ``md5('2024-01-05:b')``, not the epoch number), so those
    generations' partitions are conservatively read rather than
    definitively (and wrongly) rejected."""
    gen, raw = _gen_of(pval)
    if gen >= len(generations):
        return True
    col = predicate[1]
    epoch_us_mode = any(
        c[0] in ("days", "hours") and c[1] == col
        for g in generations
        for c in _components(g)
    )
    comps = _components(generations[gen])
    parts = raw.split("|") if len(comps) > 1 else [raw]
    if len(parts) != len(comps):
        return True  # malformed/foreign value: read conservatively
    for comp, part in zip(comps, parts):
        if (
            epoch_us_mode
            and comp[0] not in ("days", "hours")
            and _spec_source(comp) == col
        ):
            continue  # epoch-us probe cannot address this component
        if not _component_may_match(comp, part, predicate):
            return False
    return True


def evolve_partition_spec(root: str, new_spec: list) -> int:
    """Change the table's partition layout for FUTURE writes — metadata
    only, no data rewrite (Iceberg partition-spec evolution).  Existing
    partitions keep the layout of the generation that wrote them and
    keep pruning under it; rows REWRITTEN by a later merge relocate to
    the new layout through the normal partition-move path.  Validates
    the new transform's source column against the manifest-recorded
    schema (same divergence safe-list as creation).  Returns the new
    generation index.

    Runs under the table's commit lock: the spec file is a
    read-modify-write, and two unlocked concurrent evolves could assign
    the SAME generation index to different transforms — readers would
    then prune one evolve's ``g{i}:`` partitions under the other's
    transform and silently drop rows.

    Scope: the spec is TABLE metadata shared by every ref — an evolve
    changes the next write's layout on main AND on branches (Iceberg's
    model exactly: branches pin snapshots, partition specs are
    table-level).  Reads stay correct either way (each partition prunes
    under the generation that wrote it); do not expect branch-isolated
    layout experiments from write-audit-publish.
    """
    from .publish import (
        _commit_lock,
        _release_lock_if_ours,
        _verify_lock_ownership,
        read_manifest,
    )

    lock = _commit_lock(root)
    try:
        gens = _load_generations(root)
        schema = read_manifest(root).get("schema")
        if schema:
            _validate_transform_source_types(
                {name: ddl for name, ddl in schema}, list(new_spec)
            )
        gens.append(list(new_spec))
        tmp = os.path.join(root, SPEC_FILE + ".tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump({"generations": gens}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        _verify_lock_ownership(lock)  # stalled-and-robbed evolve aborts
        os.replace(tmp, os.path.join(root, SPEC_FILE))
        return len(gens) - 1
    finally:
        _release_lock_if_ours(lock)


def merge_into_hidden(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key_cols: list[str],
    **merge_kwargs,
) -> int:
    """MERGE into a hidden-partitioned table: the layout column is derived
    from the recorded spec — the caller never computes (or even sees) it,
    which is the entire point of hidden partitioning.  A row whose source
    column moved it across partition values relocates exactly like an
    explicit partition-moving update in
    :func:`..publish.merge_into_versioned`."""
    from .publish import merge_into_versioned

    gens = _load_generations(root)
    _require_utc_for_time_transform(spark, gens[-1])
    src = source.withColumn(HIDDEN_COL, _writer_column(gens))
    return merge_into_versioned(
        spark, root, src, key_cols, HIDDEN_COL, **merge_kwargs
    )


def delete_from_hidden(
    spark: SparkSession,
    root: str,
    condition,
    **delete_kwargs,
) -> int:
    """DELETE FROM a hidden-partitioned table; the predicate is on source
    columns and partition pruning falls out of the copy-on-write rewrite's
    affected-partition discovery.  ``mode="merge_on_read"`` + ``key_cols``
    pass through to the deletion-vector path."""
    from .publish import delete_from_versioned

    return delete_from_versioned(
        spark, root, HIDDEN_COL, condition, **delete_kwargs
    )


def read_hidden(
    spark: SparkSession,
    root: str,
    predicate: tuple | None = None,
    version: int | None = None,
) -> DataFrame:
    """Read the hidden-partitioned table, pruning through the recorded
    transform when ``predicate`` is on the transform's source column.

    ``predicate``: ``("between", col, lo, hi)`` (inclusive; epoch
    microseconds for time transforms) or ``("eq", col, value)``.  The
    matching row filter is always applied on the SOURCE column — pruning
    is I/O advice, never semantics — and the hidden column is dropped.
    """
    gens = _load_generations(root)
    for g in gens:
        _require_utc_for_time_transform(spark, g)
    pf = None
    if predicate is not None:
        pf = lambda pval: may_match_multi(gens, pval, predicate)  # noqa: E731
    out = read_snapshot(
        spark, root, HIDDEN_COL, version=version, partition_filter=pf
    )
    if predicate is not None:
        col = predicate[1]
        # epoch-us bounds apply when ANY generation time-transforms this
        # column (the row filter is generation-independent).  The cast
        # covers DATE source columns (unix_micros requires TIMESTAMP;
        # date→timestamp resolves in the session tz, pinned UTC above).
        time_src = any(
            c[0] in ("days", "hours") and col == c[1]
            for g in gens
            for c in _components(g)
        )
        lhs = (
            F.unix_micros(F.col(col).cast("timestamp"))
            if time_src
            else F.col(col)
        )
        if predicate[0] == "eq":
            rhs = int(predicate[2]) if time_src else predicate[2]
            out = out.filter(lhs == F.lit(rhs))
        else:
            _, _, lo, hi = predicate
            if time_src:
                lo, hi = int(lo), int(hi)
            out = out.filter((lhs >= F.lit(lo)) & (lhs <= F.lit(hi)))
    return out.drop(HIDDEN_COL)
