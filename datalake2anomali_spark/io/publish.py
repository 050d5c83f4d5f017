"""Atomic snapshot publishing for rewrite operators (manifest + versions).

``merge_into`` / ``compact_dataset`` overwrite partitions in place, and an
in-place overwrite is not atomic: a reader (or a crash) between the first
and last partition write observes a half-rewritten table.  Table formats
fix this with an immutable-files + atomic-metadata-swap protocol; this
module is that protocol reduced to its two load-bearing pieces:

- **Immutable version directories.** A writer never modifies published
  bytes: it writes a brand-new ``_v{N}`` directory containing only the
  partitions it rewrote.  Version numbers come from scanning existing
  ``_v*`` directories (not the manifest), so a crashed writer's orphan
  directory can never be reused by the next writer.
- **One-file manifest, swapped atomically.** ``_MANIFEST.json`` maps each
  live partition value to the version directory that owns it.  Publishing
  is write-temp + ``os.replace`` — atomic on POSIX — so every reader sees
  either the old mapping or the new one, never a mix.  A crash *before*
  the swap leaves the old snapshot fully intact (the new version dir is
  invisible garbage); a crash after the swap leaves the new snapshot
  fully published.  (On an object store, the swap is a conditional PUT /
  rename of the same single object — same contract.)

:func:`read_snapshot` reconstructs the table as one pruned scan per live
version: partitions are hive-encoded inside each version directory, so
owned-partition selection is an ``isin`` filter that partition-prunes at
planning time.  The live-version count stays small because every
:func:`compact_versioned` collapses the table back to a single version.

The manifest optionally carries **zone maps** — per-partition min/max for
chosen non-partition columns (``stats_cols``), recorded at write time and
maintained under the same ownership rules as the partition mapping.  A
``read_snapshot(predicate=(col, lo, hi))`` skips partitions the stats
prove empty before any file opens and still applies the row filter, so
stats are I/O advice, never semantics — the Iceberg/Delta file-skipping
metadata, reduced to its partition-granularity core.

Partition values are compared as strings (their hive-directory encoding)
throughout; driver-side state is bounded by the partition count of the
batch (merge) or table (compact/read), never by rows.

Reference parity: none — the reference writes through a remote API and
has no table-storage surface.  Extension operator per the build brief
(VERDICT r5 #5); the MERGE dataflow itself is shared with
:mod:`..operators.merge`.
"""

from __future__ import annotations

import json
import math
import os
import re
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"
_VDIR = re.compile(r"^_v(\d+)$")
_HIST = re.compile(r"^_MANIFEST\.v(\d+)\.json$")
#: A commit lock older than this is a crashed committer; stealable.
_LOCK_TTL_SECONDS = 60.0
#: _reftmp-* litter younger than this is never swept: a live ref creator
#: can stall this long between its tmp fsync and os.link (NFS stall, GC
#: pause) and must not find its tmp gone when it resumes.
_REFTMP_SWEEP_FLOOR_SECONDS = 900.0


def read_manifest(
    root: str, version: int | None = None, ref: str | None = None
) -> dict:
    """The published snapshot — current (``{"version": N, "partitions":
    {val: ver}}``), a branch head (``ref="audit"`` reads
    ``_BRANCH.audit.json`` — see :func:`create_branch`), or, with
    ``version``, the immutable historical manifest of that commit (time
    travel; ``version`` wins over ``ref``).  Raises FileNotFoundError if
    the table was never published, the branch doesn't exist, that version
    never committed, or :func:`vacuum` reclaimed the version past its
    retention window."""
    if version is not None:
        name = f"_MANIFEST.v{version}.json"
    elif ref is not None:
        name = _branch_file(ref)
    else:
        name = MANIFEST
    try:
        with open(os.path.join(root, name), encoding="utf-8") as fh:
            return json.load(fh)
    except FileNotFoundError:
        if version is not None:
            raise FileNotFoundError(
                f"versioned table at {root!r} has no snapshot v{version}: "
                "never committed, or vacuumed past the retain_last window"
            ) from None
        if ref is not None:
            raise FileNotFoundError(
                f"versioned table at {root!r} has no branch {ref!r}"
            ) from None
        raise


#: Branch / tag name charset: must stay a safe filename component.
_REF_NAME = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")
_BRANCH_FILE = re.compile(r"^_BRANCH\.(.+)\.json$")
_TAG_FILE = re.compile(r"^_TAG\.(.+)\.json$")


def _check_ref_name(name: str) -> None:
    if name == "main" or not _REF_NAME.match(name):
        raise ValueError(
            f"invalid ref name {name!r}: must match {_REF_NAME.pattern} "
            "and 'main' is reserved for the table's own pointer"
        )


def _branch_file(name: str) -> str:
    _check_ref_name(name)
    return f"_BRANCH.{name}.json"


def _tag_file(name: str) -> str:
    _check_ref_name(name)
    return f"_TAG.{name}.json"


def _write_ref_atomic(root: str, fname: str, payload: dict) -> None:
    """Crash-safe exclusive creation of a ref pointer (ADVICE r8 low):
    the JSON lands fully-fsync'd in a tmp file whose name matches neither
    ref regex, then enters its final name via ``os.link`` — atomic among
    racing creators (EEXIST replaces O_EXCL) and never observable
    truncated, so a crash mid-write cannot leave a corrupt ref that
    wedges every ``list_refs``/``vacuum`` until hand-repair.

    NFS hardening (ADVICE r9 low): a lost ``link()`` reply is
    retransmitted by the client and can surface EEXIST even though THIS
    call created the ref — ``samefile(tmp, path)`` (same inode) proves
    the link landed, so that case is success, not a duplicate.  Mounts
    that refuse hard links altogether (EPERM/EACCES/ENOTSUP/EXDEV) fall
    back to the ``O_CREAT|O_EXCL`` write, which those filesystems do
    support.  A failed write — tmp or fallback — unlinks its litter on
    the error path; anything that still escapes (SIGKILL) is reclaimed
    by :func:`vacuum`'s age-gated ``_reftmp-*`` sweep
    (``_REFTMP_SWEEP_FLOOR_SECONDS``)."""
    import errno as _errno
    import uuid as _uuid

    path = os.path.join(root, fname)
    tmp = os.path.join(root, f"_reftmp-{os.getpid()}-{_uuid.uuid4().hex}")
    try:
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(json.dumps(payload, sort_keys=True))
            fh.flush()
            os.fsync(fh.fileno())
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    try:
        try:
            os.link(tmp, path)
        except FileExistsError:
            try:
                ours = os.path.samefile(tmp, path)
            except OSError:
                ours = False
            if not ours:
                raise
        except OSError as exc:
            if exc.errno not in (
                _errno.EPERM,
                _errno.EACCES,
                _errno.ENOTSUP,
                getattr(_errno, "EOPNOTSUPP", _errno.ENOTSUP),
                _errno.EXDEV,
            ):
                raise
            # no hard links on this mount: exclusive create directly.
            # A failed write here sits at the FINAL name, so unlink it on
            # the way out — otherwise a truncated ref wedges every
            # list_refs/vacuum until hand-repair, the exact corruption
            # this function exists to prevent (only a SIGKILL inside
            # this narrow window can still leak a partial ref, and only
            # on no-hardlink mounts)
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
            try:
                with os.fdopen(fd, "w", encoding="utf-8") as fh:
                    fh.write(json.dumps(payload, sort_keys=True))
                    fh.flush()
                    os.fsync(fh.fileno())
            except BaseException:
                try:
                    os.unlink(path)
                except OSError:
                    pass
                raise
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _verify_lock_ownership(lock: tuple[str, str] | None) -> None:
    """Raise :class:`ConcurrentWriteError` if the commit lock this writer
    acquired was stolen (ADVICE r7): a committer stalled past the lock
    TTL (GC pause, slow NFS fsync) loses the lock to a waiting writer,
    and proceeding to the manifest swap anyway would silently drop the
    thief's commit.  Ownership is the token written at acquisition —
    a missing file or a different token means the lock is no longer
    ours and the commit must abort."""
    if lock is None:
        return
    path, token = lock
    try:
        with open(path, encoding="utf-8") as fh:
            current = fh.read()
    except FileNotFoundError:
        current = None
    if current != token:
        raise ConcurrentWriteError(
            f"commit lock at {path!r} was stolen mid-commit (writer "
            "stalled past the lock TTL); aborting before the manifest "
            "swap — retry against the new snapshot"
        )


def _commit_manifest(
    root: str,
    manifest: dict,
    lock: tuple[str, str] | None = None,
    ref: str | None = None,
) -> None:
    """Atomic publish: temp file in the same directory + ``os.replace``.

    The same content is also written to an immutable per-version history
    file (``_MANIFEST.v{N}.json``, BEFORE the pointer swap — a crash
    between the two leaves an orphan history file, never a dangling
    pointer) so every committed snapshot stays addressable for
    time-travel reads and change feeds until :func:`vacuum` reclaims its
    data directories.

    ``lock``: the ``(path, token)`` pair from :func:`_commit_lock`.  The
    fsyncs below are where a slow filesystem can stall a committer past
    the lock TTL, so ownership is re-verified immediately before the
    pointer swap (and the lock mtime is refreshed as a heartbeat on
    entry) — a stolen lock aborts the commit instead of racing the thief
    to a lost update (ADVICE r7).

    ``ref``: a branch name makes the swap target that branch's pointer
    file instead of the table's main ``_MANIFEST.json`` — same history
    file, same atomicity, different head (see :func:`create_branch`)."""
    # stamp the commit wall-clock (timestamp time travel / history);
    # forced strictly increasing past the pointer's previous commit so
    # AS OF TIMESTAMP resolution is total even under clock staleness
    ts = time.time()
    try:
        prev = read_manifest(root, ref=ref).get("committed_at")
        if prev is not None and ts <= prev:
            ts = prev + 1e-6
    except FileNotFoundError:
        pass
    manifest = dict(manifest)
    manifest["committed_at"] = ts
    if lock is not None:
        # heartbeat: we are live, keep the TTL clock fresh through the
        # fsync-heavy section (only after proving the lock is still ours
        # — touching the path blindly would refresh a thief's lock)
        _verify_lock_ownership(lock)
        try:
            os.utime(lock[0])
        except FileNotFoundError:
            pass  # stolen between verify and utime; the pre-swap check catches it
    payload = json.dumps(manifest, sort_keys=True)
    hist = os.path.join(root, f"_MANIFEST.v{manifest['version']}.json")
    with open(hist, "w", encoding="utf-8") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    fd, tmp = tempfile.mkstemp(
        prefix="_MANIFEST.", suffix=".tmp", dir=root, text=True
    )
    with os.fdopen(fd, "w", encoding="utf-8") as fh:
        fh.write(payload)
        fh.flush()
        os.fsync(fh.fileno())
    try:
        _verify_lock_ownership(lock)  # last instant before the swap
    except ConcurrentWriteError:
        # the commit never happened: drop the temp pointer AND the
        # just-written history file (it would otherwise read as a
        # committed snapshot to table_history/vacuum), and release the
        # claim so vacuum can reclaim the orphan version directory
        os.unlink(tmp)
        try:
            os.unlink(hist)
        except FileNotFoundError:
            pass
        _release_claim(root, manifest["version"])
        raise
    pointer = MANIFEST if ref is None else _branch_file(ref)
    os.replace(tmp, os.path.join(root, pointer))
    _release_claim(root, manifest["version"])


class ConstraintViolationError(ValueError):
    """A write would commit rows that fail a table CHECK constraint; it
    is refused before any version directory is even claimed, so a
    rejected write leaves no garbage behind."""


def _check_constraints(df: DataFrame, constraints: dict[str, str]) -> None:
    """Validate ``df`` against named SQL CHECK expressions in ONE
    aggregate pass (ANSI semantics: a row passes when the expression is
    TRUE **or NULL**).  Raises :class:`ConstraintViolationError` naming
    every violated constraint with its row count — enforcement happens on
    the data being written (batch-bounded), matching Delta's model where
    existing data was validated by the write that produced it."""
    if not constraints:
        return
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(expr), F.lit(True))).cast("long")
        ).alias(name)
        for name, expr in constraints.items()
    ]
    row = df.agg(*aggs).collect()[0]
    bad = {
        name: int(row[name])
        for name in constraints
        if row[name] and int(row[name]) > 0
    }
    if bad:
        detail = ", ".join(
            f"{name} ({constraints[name]!r}): {n} row(s)"
            for name, n in sorted(bad.items())
        )
        raise ConstraintViolationError(
            f"write rejected by CHECK constraint(s): {detail}"
        )


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this writer's snapshot read and
    its manifest swap — the optimistic-concurrency conflict.  The loser's
    version directory is orphaned garbage (``vacuum`` reclaims it); retry
    the whole operation against the new snapshot."""


def _next_version(root: str) -> int:
    """1 + the highest version seen on disk: ``_v*`` directories
    (published or orphaned — a crashed writer's leftovers are never
    written into again) AND ``_MANIFEST.v*`` history files.  The history
    scan matters for a shallow clone: its root starts with ZERO local
    ``_v*`` directories while its manifest references the source's
    version numbers through ``fallback_roots`` — without it, the clone's
    first claim would reuse version 1, move the pointer backward, and a
    later local ``_v{N}`` would shadow the fallback directory still
    owning untouched partitions."""
    vs = [0]
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m and os.path.isdir(os.path.join(root, name)):
            vs.append(int(m.group(1)))
            continue
        h = _HIST.match(name)
        if h:
            vs.append(int(h.group(1)))
    return max(vs) + 1


def _claim_marker(root: str, version: int) -> str:
    """Sibling marker file a live writer holds on its claimed version dir.
    It lives OUTSIDE the version directory because Spark's overwrite write
    recreates the directory itself.  Released at commit (success or
    detected conflict); a crashed writer's stale marker is reclaimed by
    :func:`vacuum` after ``claim_ttl_seconds``."""
    return os.path.join(root, f"_CLAIM.v{version}")


def _release_claim(root: str, version: int) -> None:
    try:
        os.unlink(_claim_marker(root, version))
    except FileNotFoundError:
        pass


def _claim_version(root: str) -> int:
    """Atomically claim the next version slot: ``os.makedirs(exist_ok=
    False)`` on the version directory IS the lock — two racing writers
    cannot both create it, and the loser simply claims the next number.
    (On an object store this is a conditional PUT of a marker object.)
    A ``_CLAIM.v{N}`` marker then shields the in-flight directory from a
    concurrent :func:`vacuum` until the writer commits or gives up."""
    while True:
        v = _next_version(root)
        try:
            os.makedirs(version_dir(root, v), exist_ok=False)
        except FileExistsError:
            continue
        with open(_claim_marker(root, v), "w", encoding="utf-8") as fh:
            fh.write("")  # mtime is the claim's liveness clock
        return v


def _commit_lock(root: str) -> tuple[str, str]:
    """Acquire the table's commit lock: ``O_CREAT|O_EXCL`` on a single
    lock file, the local-filesystem CAS primitive (ADVICE r6) — the
    version check and the manifest swap run mutually exclusive among live
    writers, so two writers racing past the same base version can no
    longer both commit.  A lock older than ``_LOCK_TTL_SECONDS`` belongs
    to a crashed committer and is stolen.  (On an object store the same
    role is played by a conditional PUT of the manifest itself.)

    Returns ``(path, token)``: the token written into the lock file is
    this writer's ownership proof, re-verified right before the manifest
    swap so a stalled-then-robbed committer aborts instead of overwriting
    the thief's commit (ADVICE r7)."""
    import uuid as _uuid

    path = os.path.join(root, "_COMMIT.lock")
    token = _uuid.uuid4().hex
    deadline = time.monotonic() + _LOCK_TTL_SECONDS + 10.0
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            with os.fdopen(fd, "w", encoding="utf-8") as fh:
                fh.write(token)
                fh.flush()
                os.fsync(fh.fileno())
            # reclaim renamed-away stale locks from past steals
            base = os.path.basename(path)
            for name in os.listdir(root):
                if name.startswith(base + ".stale."):
                    try:
                        os.unlink(os.path.join(root, name))
                    except FileNotFoundError:
                        pass
            return path, token
        except FileExistsError:
            try:
                age = time.time() - os.stat(path).st_mtime
            except FileNotFoundError:
                continue  # released between our attempts
            if age > _LOCK_TTL_SECONDS:
                # atomic steal: rename the stale lock to a unique name —
                # exactly ONE waiter wins the rename; a plain unlink here
                # would let a second waiter delete the winner's FRESH lock
                # (stat-then-unlink TOCTOU) and both would enter the
                # critical section
                try:
                    os.rename(path, f"{path}.stale.{_uuid.uuid4().hex}")
                except (FileNotFoundError, OSError):
                    pass  # someone else stole it first
                continue
            if time.monotonic() > deadline:
                raise RuntimeError(
                    f"commit lock at {path!r} held past its TTL"
                ) from None
            time.sleep(0.005)


def _commit_checked(
    root: str, manifest: dict, base_version: int, ref: str | None = None
) -> None:
    """Compare-and-swap commit: under the table's commit lock, re-read the
    pointer and refuse if another writer advanced it past ``base_version``
    — last-write-wins would silently drop the other writer's partitions.
    The lock makes check + swap atomic among live local writers (a crashed
    lock holder is stolen after a TTL); a detected conflict releases the
    loser's claim marker so :func:`vacuum` can reclaim its orphan
    directory immediately.  With ``ref``, the check-and-swap runs against
    that branch's pointer (one table-wide lock serializes every ref —
    coarse, but version numbers are shared across refs anyway)."""
    lock = _commit_lock(root)
    try:
        current = read_manifest(root, ref=ref)["version"]
        if current != base_version:
            _release_claim(root, manifest["version"])
            where = f"branch {ref!r} of table" if ref else "table"
            raise ConcurrentWriteError(
                f"{where} at {root!r} moved from v{base_version} to "
                f"v{current} during this write; retry against the new snapshot"
            )
        _commit_manifest(root, manifest, lock=lock, ref=ref)
    finally:
        _release_lock_if_ours(lock)


def _release_lock_if_ours(lock: tuple[str, str]) -> None:
    """Release the commit lock only if it is still OURS: after a TTL
    steal the path holds the thief's fresh lock, and unlinking it would
    let a third writer enter the thief's critical section (ADVICE r7)."""
    path, token = lock
    try:
        with open(path, encoding="utf-8") as fh:
            still_ours = fh.read() == token
    except FileNotFoundError:
        still_ours = False
    if still_ours:
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


def _schema_record(df: DataFrame) -> list[list[str]]:
    """Manifest-recorded schema: [name, DDL type] per column — what lets
    the reader back-fill typed NULLs for partitions written before a
    schema-widening merge."""
    return [[f.name, f.dataType.simpleString()] for f in df.schema.fields]


#: Characters Spark's hive partition-value inference can interpret as a
#: numeric / date / timestamp rendering.  A raw directory value containing
#: anything OUTSIDE this set is inferred StringType, whose ``str()`` is the
#: raw value itself — so the footer fast path may key it verbatim.
_PARTITION_AMBIGUOUS_CHARS = frozenset("0123456789+-.:eET /")

_CANONICAL_LONG_RE = re.compile(r"-?(0|[1-9][0-9]*)")


def _partition_value_renders_verbatim(raw: str) -> bool:
    """True when Spark's partition-type inference of ``raw`` is guaranteed
    to stringify back to ``raw`` — the exactness contract that lets the
    footer fast path key manifests by the directory value directly.

    Cases accepted: canonical longs (no leading zeros / plus sign — Java's
    ``parseInt`` would re-render those differently), strict ISO dates
    (``DateType`` stringifies to the same ISO form), and values containing
    a character no numeric/date/timestamp rendering can contain (inferred
    StringType verbatim).  Anything ambiguous ("0123", "1.50", "1e3",
    timestamp-shaped strings) returns False and the caller falls back to
    the Spark scan whose semantics are the historical contract."""
    if _CANONICAL_LONG_RE.fullmatch(raw):
        return -(2**63) <= int(raw) < 2**63
    if len(raw) == 10:
        import datetime as _dt

        try:
            _dt.date.fromisoformat(raw)
            return True
        except ValueError:
            pass
    return any(ch not in _PARTITION_AMBIGUOUS_CHARS for ch in raw)


def _footer_partition_files(
    vdir: str, partition_col: str
) -> dict[str, list[str]] | None:
    """{raw_partition_value: [parquet paths]} for a freshly written
    single-level hive layout, or None when the layout (or any value's
    rendering) is not provably equivalent to the Spark-scan contract.
    Skips underscore/dot-prefixed entries exactly as Spark's file index
    does (``_SUCCESS``, ``_dv``, ``_append``, checksums)."""
    from urllib.parse import unquote

    prefix = partition_col + "="
    out: dict[str, list[str]] = {}
    try:
        entries = sorted(os.listdir(vdir))
    except OSError:
        return None
    for d in entries:
        if d.startswith(("_", ".")):
            continue
        pdir = os.path.join(vdir, d)
        if not os.path.isdir(pdir) or not d.startswith(prefix):
            return None  # unrecognized layout: let the scan decide
        raw = unquote(d[len(prefix):])
        if raw == "__HIVE_DEFAULT_PARTITION__":
            return None  # null partition: historical path raises/renders
        if not _partition_value_renders_verbatim(raw):
            return None
        files = [
            os.path.join(pdir, f)
            for f in sorted(os.listdir(pdir))
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if files:
            out[raw] = files
    return out


def _written_partition_counts(
    spark: SparkSession, vdir: str, partition_col: str
) -> dict:
    """{raw_pval: row_count} over a freshly written version directory.

    Fast path: parquet FOOTER metadata (``num_rows`` per file summed per
    hive directory) — exactly what every table format derives at commit
    time from the files it just wrote, metadata-scale I/O instead of a
    data rescan (at 100 TB the commit must not re-read its own write; the
    footer list is bounded by the commit's file count).  Falls back to
    the historical one-job Spark scan whenever the layout or a partition
    value's rendering is not provably identical (guard:
    :func:`_partition_value_renders_verbatim`)."""
    by_part = _footer_partition_files(vdir, partition_col)
    if by_part:  # empty dict falls through: the scan raises the
        # historical no-files-to-infer-schema error
        import pyarrow.parquet as pq

        try:
            return {
                p: sum(pq.read_metadata(f).num_rows for f in files)
                for p, files in by_part.items()
            }
        except Exception:
            pass  # unreadable footer: the scan will surface the real error
    # scan fallback groups by the SPARK string rendering so its keys
    # match the footer path's raw hive-dir strings and the manifest keys
    # for every partition type (Python str() diverges for bool/float)
    return {
        r[0]: r[1]
        for r in spark.read.parquet(vdir)
        .groupBy(F.col(partition_col).cast("string").alias(partition_col))
        .agg(F.count(F.lit(1)))
        .collect()
    }


def version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"_v{version}")


def _dv_dir(root: str, version: int) -> str:
    """Deletion-vector parquet of a merge-on-read DELETE commit — lives
    INSIDE the commit's claimed version directory, so it inherits the
    immutability, claim-marker, and vacuum-protection rules of data
    directories for free."""
    return os.path.join(version_dir(root, version), "_dv")


def _manifest_rowcount(manifest: dict) -> int | None:
    """Logical COUNT(*) from metadata: physical per-partition rows minus
    merge-on-read deletions.  None when counts are incomplete."""
    rows = manifest.get("rows")
    if rows is None or set(rows) != set(manifest["partitions"]):
        return None
    deleted = sum(
        int(n) for n in manifest.get("dv", {}).get("deleted", {}).values()
    )
    return sum(int(n) for n in rows.values()) - deleted


def _carry_dv(manifest: dict, rewritten_pvals: set[str]) -> dict | None:
    """The deletion-vector record carried into a commit that REWRITES
    ``rewritten_pvals``: rewritten partitions drop their DV entries (the
    rewrite read the DV-applied snapshot, so the deletions are now
    physical — and a re-inserted key must not be re-deleted by a stale
    vector), untouched partitions keep theirs."""
    dv = manifest.get("dv")
    if not dv:
        return None
    files = {
        p: list(vs)
        for p, vs in dv.get("files", {}).items()
        if p not in rewritten_pvals
    }
    if not files:
        return None
    return {
        "key_cols": list(dv["key_cols"]),
        "files": files,
        "deleted": {
            p: int(n)
            for p, n in dv.get("deleted", {}).items()
            if p in files
        },
    }


def _dv_versions(manifest: dict):
    for vs in manifest.get("dv", {}).get("files", {}).values():
        for v in vs:
            yield int(v)


def _append_dir(root: str, version: int) -> str:
    """Append-delta parquet of a merge-on-read UPDATE commit — the
    replacement rows, partitioned like the table.  Lives INSIDE the
    commit's claimed version directory next to ``_dv`` so it inherits
    the immutability, claim-marker, and vacuum-protection rules."""
    return os.path.join(version_dir(root, version), "_append")


def _schema_events(manifest: dict) -> list[tuple[int, int, dict]]:
    """The manifest's rename/add event log merged in replay order:
    ``(version, kind, event)`` with kind 0 = rename, 1 = add — renames
    before adds within one commit, matching :func:`alter_table_columns`'
    drop → rename → add validation order.  The ONE ordering every
    replayer (:func:`_map_physical`, the index's rename follower) must
    share, or their replays silently diverge."""
    return sorted(
        [(int(r["v"]), 0, r) for r in manifest.get("renames", [])]
        + [(int(a["v"]), 1, a) for a in manifest.get("adds", [])],
        key=lambda e: (e[0], e[1]),
    )


def _map_physical(df: DataFrame, manifest: dict, written_v: int) -> DataFrame:
    """Map a piece's PHYSICAL column names to the table's logical names:
    replay, in commit order, every schema event committed AFTER the
    piece was written (a piece written post-event already carries the
    new physical layout).

    - rename: if the target name is already physically present it must
      be a column that was logically dropped before the rename was
      allowed (validation refuses live duplicates), so the stale
      physical column is dropped first, then the rename applies.
    - add: a piece that physically carries the added name must be
      holding a DROPPED predecessor's bytes — those must read as NULL
      under the re-added column, not resurrect, so the stale physical
      column is dropped (the recorded-schema projection then fills
      NULL).

    Within one commit renames replay before adds, matching
    :func:`alter_table_columns`' drop → rename → add validation order
    (a single commit may rename ``a`` away AND re-add a fresh ``a``)."""
    for v, kind, ev in _schema_events(manifest):
        if v <= written_v:
            continue
        if kind == 0:
            if ev["from"] in df.columns:
                if ev["to"] in df.columns:
                    df = df.drop(ev["to"])
                df = df.withColumnRenamed(ev["from"], ev["to"])
        elif ev["name"] in df.columns:
            df = df.drop(ev["name"])
    return df


def _resolve_vdir(root: str, manifest: dict, v: int) -> str:
    """The version directory's REAL location: local first, then each of
    the manifest's ``fallback_roots`` in order — how a shallow clone
    (:func:`clone_table`) reads the source's immutable directories
    without copying a byte.  Own writes always land locally, so a local
    directory shadows any fallback of the same number."""
    local = version_dir(root, v)
    if os.path.isdir(local):
        return local
    for fb in manifest.get("fallback_roots", []):
        cand = version_dir(fb, v)
        if os.path.isdir(cand):
            return cand
    return local  # let the reader raise its usual missing-dir error


def _carry_appends(manifest: dict, rewritten_pvals: set[str]) -> dict | None:
    """The append-delta record carried into a commit that REWRITES
    ``rewritten_pvals``: rewritten partitions drop their append entries
    (the rewrite read the applied snapshot, so the replacement rows are
    now physical in the fresh directory), untouched partitions keep
    theirs — the exact :func:`_carry_dv` discipline."""
    ap = manifest.get("appends")
    if not ap:
        return None
    kept = {p: list(vs) for p, vs in ap.items() if p not in rewritten_pvals}
    return kept or None


def _append_versions(manifest: dict):
    for vs in manifest.get("appends", {}).values():
        for v in vs:
            yield int(v)


def _widen_partition_stats(old: dict, add: dict) -> dict:
    """Zone-map entry after appending rows to a partition: per column the
    union of the recorded [min, max] and the appended rows' — widening
    only, never tightening, so skipping stays advisory-safe.  A ``None``
    bound on either side stays ``None`` (the reader already treats it as
    unusable-for-skipping, the conservative direction)."""
    out = {}
    for c, rng in old.items():
        arng = add.get(c)
        if arng is None:
            out[c] = rng
            continue
        lo = None if rng[0] is None or arng[0] is None else min(rng[0], arng[0])
        hi = None if rng[1] is None or arng[1] is None else max(rng[1], arng[1])
        out[c] = [lo, hi]
    return out


def _or_bloom_hex(a: str, b: str) -> str:
    """Union of two per-partition bloom filters (same geometry): bitwise
    OR of the hex bitmaps — appending rows can only SET bits, so the
    merged filter keeps the no-false-negative guarantee."""
    width = max(len(a), len(b))
    return format(int(a, 16) | int(b, 16), f"0{width}x")


def _partition_stats(
    spark: SparkSession,
    vdir: str,
    partition_col: str,
    stats_cols: list[str],
) -> dict[str, dict[str, list]]:
    """Per-partition ``{pval: {col: [min, max]}}`` over a freshly written
    version directory — ONE aggregate scan of exactly the partitions the
    writer just produced, collected driver-side bounded by partition
    count.  This is the zone-map half of a table format's metadata:
    min/max per partition for NON-partition columns, so readers can skip
    partitions on predicates the directory layout can't prune."""
    footer = _footer_partition_stats(vdir, partition_col, stats_cols)
    if footer is not None:
        return footer
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    rows = (
        spark.read.parquet(vdir)
        .groupBy(F.col(partition_col).cast("string").alias(partition_col))
        .agg(*aggs)
        .collect()
    )
    return {
        str(r[partition_col]): {
            c: [r[f"_lo_{c}"], r[f"_hi_{c}"]] for c in stats_cols
        }
        for r in rows
    }


#: Arrow type ids whose parquet chunk statistics are exact and whose
#: Python renderings match Spark's collect() values: signed/unsigned
#: integers (pyarrow type ids 2-9 → int) and float32/float64 (10-12 →
#: float).  Strings are excluded (writers may truncate binary stats) and
#: so is everything temporal/nested — those fall back to the Spark scan.
_FOOTER_STATS_EXACT_KINDS = ("int", "float", "double")


def _footer_partition_stats(
    vdir: str, partition_col: str, stats_cols: list[str]
) -> dict[str, dict[str, list]] | None:
    """Zone maps from parquet FOOTER statistics — the metadata-only twin
    of the Spark-scan aggregate (guide §1/§6: the commit should not
    re-read the data it just wrote; chunk min/max for integral and
    floating columns is exact, and parquet-mr omits the stats entirely
    for NaN-polluted double chunks, which routes those to the fallback).

    Returns None whenever ANY condition needed for bit-identical results
    is not provable: unrecognized layout, ambiguous partition rendering,
    a missing/none statistics object on a chunk holding non-null values,
    a non-numeric column type, or a column absent from a file's schema.
    All-null chunks (null_count == num rows) legitimately carry no
    min/max and contribute nothing; a partition whose every chunk is
    all-null yields [None, None], exactly like the scan's min/max."""
    by_part = _footer_partition_files(vdir, partition_col)
    if not by_part:
        return None
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    try:
        for p, files in by_part.items():
            lo: dict[str, object] = {c: None for c in stats_cols}
            hi: dict[str, object] = {c: None for c in stats_cols}
            for fpath in files:
                md = pq.read_metadata(fpath)
                schema = md.schema.to_arrow_schema()
                idx = {}
                for c in stats_cols:
                    i = schema.get_field_index(c)
                    if i < 0:
                        return None
                    kind = str(schema.field(i).type)
                    if not kind.startswith(_FOOTER_STATS_EXACT_KINDS):
                        return None
                    idx[c] = i
                for rg in range(md.num_row_groups):
                    row_group = md.row_group(rg)
                    for c, i in idx.items():
                        col = row_group.column(i)
                        st = col.statistics
                        if st is None:
                            return None
                        if not st.has_min_max:
                            if st.num_values == 0:
                                continue  # all-null chunk: nothing to fold
                            return None  # stats withheld (e.g. NaN): scan
                        mn, mx = st.min, st.max
                        if not isinstance(mn, (int, float)) or isinstance(
                            mn, bool
                        ):
                            return None
                        if lo[c] is None or mn < lo[c]:
                            lo[c] = mn
                        if hi[c] is None or mx > hi[c]:
                            hi[c] = mx
            out[p] = {c: [lo[c], hi[c]] for c in stats_cols}
    except Exception:
        return None
    return out


#: Bloom-filter geometry FLOOR: bits per per-partition filter / hash
#: functions.  1024 bits ≈ 256 hex chars per (partition, column) in the
#: manifest; at k=3 the false-positive rate stays under ~2% up to ~100
#: distinct values per partition and degrades gracefully (a saturated
#: filter only stops skipping — it can never drop a row).  Tables are
#: no longer pinned to this floor: ``init_table`` sizes ``m`` from the
#: observed max per-partition distinct count (~10 bits/key, next power
#: of two, capped at :data:`_BLOOM_M_CAP`) and records the choice in the
#: manifest (``bloom_geometry``), because the fixed 1024-bit filter
#: measured 24% false positives at a mere 333 keys/partition and would
#: saturate outright at one scale-up (margin audit r14) — the I/O
#: advice must survive the scale the operator exists for.  Readers and
#: every later write use the RECORDED geometry (filters merge by OR, so
#: all filters of a table must share it); manifests without the record
#: probe at this floor, keeping old tables readable.  ONE sanctioned
#: exception: ``compact_versioned`` rewrites the whole snapshot with no
#: old bitmaps to OR-merge against, so it RE-CHOOSES the geometry — the
#: escape hatch for a table that grew past its init-time key density.
_BLOOM_M = 1024
_BLOOM_K = 3
#: Geometry ceiling: 2^18 bits = 64 Ki hex chars per (partition, column)
#: in the JSON manifest — ~26k keys/partition at full quality.  Past it
#: the filter degrades gracefully again; partition-granularity blooms on
#: a near-unique key at that density belong in file-level index blobs
#: (Iceberg puffin / Delta index files), not a JSON manifest.
_BLOOM_M_CAP = 1 << 18
#: Target density: ~10 bits per distinct key keeps FPR ≈ 1.7% at k=3.
_BLOOM_BITS_PER_KEY = 10


def _choose_bloom_geometry(
    spark: SparkSession,
    vdir: str,
    partition_col: str,
    bloom_cols: list[str],
) -> tuple[int, int]:
    """(m, k) sized for the just-written data: one aggregate scan for
    the max per-partition distinct count over the bloom columns, then
    ``m`` = next power of two ≥ 10 bits/key, clamped to
    [``_BLOOM_M``, ``_BLOOM_M_CAP``]."""
    df = spark.read.parquet(vdir)
    row = (
        df.groupBy(partition_col)
        .agg(*[F.countDistinct(c).alias(f"_d_{c}") for c in bloom_cols])
        .agg(*[F.max(f"_d_{c}").alias(c) for c in bloom_cols])
        .collect()[0]
    )
    n_max = max(int(row[c] or 0) for c in bloom_cols)
    m = _BLOOM_M
    while m < min(_BLOOM_M_CAP, n_max * _BLOOM_BITS_PER_KEY):
        m <<= 1
    return m, _BLOOM_K


def _bloom_col_union(old_blooms: dict) -> list[str]:
    """The table's full bloom-column set: the UNION across partition
    entries, not an arbitrary first partition's keys — a partition whose
    column was all-NULL at write time has no entry for it, and deriving
    the set from that partition would silently drop the column's bloom
    table-wide on the next rebuild (code-review r14)."""
    cols: set[str] = set()
    for bms in old_blooms.values():
        cols.update(bms)
    return sorted(cols)


def _manifest_bloom_geometry(manifest: dict) -> tuple[int, int]:
    """The geometry every probe and every later write of this table must
    use; pre-adaptive manifests carry no record and probe at the floor."""
    geo = manifest.get("bloom_geometry") or {}
    return int(geo.get("m", _BLOOM_M)), int(geo.get("k", _BLOOM_K))


def bloom_probe_positions(
    value, m: int = _BLOOM_M, k: int = _BLOOM_K
) -> list[int]:
    """The ``k`` bit positions a value hashes to — pure-Python twin of the
    Spark-side expression in :func:`_partition_blooms` (both sides take
    the first 15 hex chars of ``md5("{value}:{seed}")``, so a manifest
    written by a cluster is probed identically by any reader)."""
    import hashlib

    return [
        int(hashlib.md5(f"{value}:{seed}".encode()).hexdigest()[:15], 16) % m
        for seed in range(k)
    ]


def _bloom_position_exprs(col: str, m: int, k: int):
    return [
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.col(col).cast("string"), F.lit(str(seed))
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % m
        )
        for seed in range(k)
    ]


def _partition_blooms(
    spark: SparkSession,
    vdir: str,
    partition_col: str,
    bloom_cols: list[str],
    m: int = _BLOOM_M,
    k: int = _BLOOM_K,
) -> dict[str, dict[str, str]]:
    """Per-partition bloom bitmaps ``{pval: {col: hex}}`` over a freshly
    written version directory — the equality-predicate complement of
    :func:`_partition_stats`' range zone maps (Delta/Iceberg bloom-index
    metadata reduced to partition granularity).  One aggregate scan per
    column; driver-side state is bounded by partitions × ``m`` bits.
    NULLs are not represented (an equality probe is never NULL)."""
    df = spark.read.parquet(vdir)
    out: dict[str, dict[str, str]] = {}
    for c in bloom_cols:
        pos = F.explode(F.array(*_bloom_position_exprs(c, m, k))).alias("_pos")
        rows = (
            df.filter(F.col(c).isNotNull())
            .select(
                F.col(partition_col).cast("string").alias(partition_col), pos
            )
            .groupBy(partition_col)
            .agg(F.collect_set("_pos").alias("_ps"))
            .collect()
        )
        for r in rows:
            bits = 0
            for p in r["_ps"]:
                bits |= 1 << int(p)
            out.setdefault(str(r[partition_col]), {})[c] = f"{bits:x}"
    return out


def _bloom_may_contain(hex_bits: str, value, m: int = _BLOOM_M, k: int = _BLOOM_K) -> bool:
    bits = int(hex_bits, 16)
    return all((bits >> p) & 1 for p in bloom_probe_positions(value, m, k))


_BLOOM_SAFE_TYPES = (
    "tinyint", "smallint", "int", "bigint", "string", "date"
)


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _normalize_bloom_probe(manifest: dict, col: str, value):
    """Render an equality-probe value exactly as the writer-side
    ``CAST(col AS STRING)`` rendered the column, or declare the bloom
    unusable (ADVICE r7): probing ``5.0`` (or ``"05"``) against a bigint
    bloom hashes a different string than the writer did, producing a
    false 'definitive' negative that silently drops matching partitions.

    Returns ``(probe_value, usable)`` — ``usable=False`` means skip bloom
    pruning for this read (conservative: every partition is read and the
    always-applied row filter still decides membership)."""
    schema = manifest.get("schema")
    if not schema:
        # pre-schema-recording manifest: only trust a probe that is
        # already the writer's native rendering (str or int)
        if isinstance(value, bool) or not isinstance(value, (str, int)):
            return value, False
        return value, True
    ddl = next((t for n, t in schema if n == col), None)
    if ddl is None:
        return value, False
    if ddl in _INTEGRAL_TYPES:
        if isinstance(value, bool):
            return value, False
        if isinstance(value, int):
            return value, True
        if isinstance(value, float) and value.is_integer():
            return int(value), True
        if isinstance(value, str):
            try:
                return int(value, 10), True
            except ValueError:
                return value, False
        return value, False
    if ddl == "string":
        return (value, True) if isinstance(value, str) else (value, False)
    if ddl == "date":
        import datetime as _dt

        if isinstance(value, _dt.datetime):
            return value, False  # renders with a time component
        if isinstance(value, _dt.date):
            return value.isoformat(), True
        if isinstance(value, str):
            # canonicalize to the writer's zero-padded ISO rendering: the
            # row filter casts '2024-1-5' to the same DATE as
            # '2024-01-05', so an un-normalized probe would hash a string
            # the writer never wrote — a false definitive negative
            try:
                y, m, d = value.split("-")
                return _dt.date(int(y), int(m), int(d)).isoformat(), True
            except (ValueError, AttributeError):
                return value, False
        return value, False
    # non-bloom-safe column types never have recorded blooms; anything
    # else is a mismatch the probe cannot render faithfully
    return value, False


def _validate_bloom_cols(df: DataFrame, bloom_cols: list[str]) -> None:
    """Bloom probes hash the PYTHON ``str(value)`` while the writer hashes
    Spark's ``CAST(col AS STRING)``; the two renderings agree only for
    integral/string/date types (booleans differ in case, floats in
    scientific-notation thresholds, timestamps in formatting) — and a
    divergent rendering would turn the 'definitive' bloom negative into a
    silent wrong answer, so unsafe types are refused at write time."""
    bad = [
        (c, dict(df.dtypes)[c])
        for c in bloom_cols
        if dict(df.dtypes)[c] not in _BLOOM_SAFE_TYPES
    ]
    if bad:
        raise ValueError(
            f"bloom_cols must be integral/string/date (python and Spark "
            f"string renderings must agree); unsupported: {bad}"
        )


def init_table(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    partition_col: str,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    constraints: dict[str, str] | None = None,
) -> None:
    """Create a versioned table at ``root`` from ``df`` (version 1),
    optionally recording per-partition min/max zone maps for
    ``stats_cols``, per-partition bloom filters for ``bloom_cols``
    (equality-probe skipping), and/or named SQL CHECK ``constraints``
    enforced on this and every later write."""
    _check_constraints(df, constraints or {})
    if bloom_cols:
        _validate_bloom_cols(df, bloom_cols)
    os.makedirs(root, exist_ok=True)
    v = _claim_version(root)
    vdir = version_dir(root, v)
    df.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)
    counts = _written_partition_counts(spark, vdir, partition_col)
    _require_non_null_partitions(counts)
    parts = [str(p) for p in counts]
    manifest = {
        "version": v,
        "partitions": {p: v for p in sorted(parts)},
        "operation": "create",
        "schema": _schema_record(df),
        "rows": {str(p): n for p, n in counts.items()},
    }
    if constraints:
        manifest["constraints"] = dict(constraints)
    if stats_cols:
        manifest["stats"] = _partition_stats(
            spark, vdir, partition_col, stats_cols
        )
    if bloom_cols:
        # one extra aggregate pass over the just-written (page-cached)
        # version dir — create-only, metadata-scale output; folding it
        # into _partition_blooms' per-column scan would couple the two
        # for a marginal win (code-review r14, accepted cost)
        bm, bk = _choose_bloom_geometry(spark, vdir, partition_col, bloom_cols)
        manifest["bloom"] = _partition_blooms(
            spark, vdir, partition_col, bloom_cols, m=bm, k=bk
        )
        manifest["bloom_geometry"] = {"m": bm, "k": bk}
    _commit_manifest(root, manifest)


def read_snapshot(
    spark: SparkSession,
    root: str,
    partition_col: str,
    predicate: tuple[str, float, float] | None = None,
    version: int | None = None,
    eq_predicate: tuple[str, object] | None = None,
    partition_filter=None,
    ref: str | None = None,
) -> DataFrame:
    """The published table: for each live version, one partition-pruned
    scan of its directory restricted to the partitions it still owns.

    ``predicate = (col, lo, hi)`` applies ``col BETWEEN lo AND hi`` AND
    uses the manifest's zone maps to skip partitions whose recorded
    [min, max] cannot intersect — the reader-side payoff of
    ``stats_cols``.  ``eq_predicate = (col, value)`` applies
    ``col = value`` AND uses the manifest's bloom filters (``bloom_cols``)
    to skip partitions the filter proves cannot hold the value — the
    point-lookup complement (a bloom false positive only reads an extra
    partition; a negative is definitive).  Both kinds of skipping are
    advisory-safe: partitions without metadata for ``col`` are
    conservatively read, and the row filter is always applied, so the
    result never depends on metadata being present or tight.

    ``version`` reads the table AS OF that commit via its immutable
    historical manifest (valid until :func:`vacuum` reclaims the data
    directories the old snapshot references — the standard VACUUM
    retention trade every table format makes).

    ``partition_filter`` is the generic skipping hook: a
    ``Callable[[str], bool]`` over partition values; values it rejects
    are skipped like a metadata miss.  Callers own its safety contract
    (it must never reject a partition that could hold a matching row) —
    :mod:`.hidden` uses it for transform-derived pruning.

    ``ref`` reads a branch head instead of main (``version`` wins if
    both are given) — the audit half of write-audit-publish.
    """
    manifest = read_manifest(root, version, ref=ref)
    stats = manifest.get("stats", {})
    blooms = manifest.get("bloom", {})
    bloom_m, bloom_k = _manifest_bloom_geometry(manifest)
    bloom_probe = None
    if eq_predicate is not None:
        # normalize the probe to the recorded column type so it hashes
        # the writer's exact string rendering; an unrenderable probe
        # disables bloom skipping (I/O advice only — the row filter
        # below still applies the equality exactly)  [ADVICE r7]
        _c, _v = eq_predicate
        probe_val, usable = _normalize_bloom_probe(manifest, _c, _v)
        if usable:
            bloom_probe = (_c, probe_val)
    by_version: dict[int, list[str]] = {}
    for pval, v in manifest["partitions"].items():
        if partition_filter is not None and not partition_filter(pval):
            continue
        if predicate is not None:
            col, lo, hi = predicate
            rng = stats.get(pval, {}).get(col)
            if (
                rng is not None
                and rng[0] is not None
                and rng[1] is not None
                and (rng[1] < lo or rng[0] > hi)
            ):
                continue  # zone map proves no row can match
        if bloom_probe is not None:
            col, val = bloom_probe
            hx = blooms.get(pval, {}).get(col)
            if hx is not None and not _bloom_may_contain(
                hx, val, m=bloom_m, k=bloom_k
            ):
                continue  # bloom negative is definitive
        by_version.setdefault(int(v), []).append(pval)
    schema_rec = manifest.get("schema")
    ddl_map = dict(schema_rec) if schema_rec else {}

    def _normalize_types(df: DataFrame) -> DataFrame:
        # pin recorded column TYPES per piece, before any union: hive
        # partition-type inference re-types the partition column per
        # version directory (a days() value infers DATE, a truncate()
        # value INT, a later generation's value STRING — see .hidden),
        # and a cross-version union would coerce toward the wrong type
        if not ddl_map:
            return df
        return df.select(
            *[
                F.col(c).cast(ddl_map[c]).alias(c) if c in ddl_map else F.col(c)
                for c in df.columns
            ]
        )

    # merge-on-read UPDATE append-deltas: partitions that survived the
    # skipping above also contribute their replacement-row files.  Each
    # piece (base or append) carries its writing version as ``_wv`` when
    # appends exist, because deletion vectors then apply by SEQUENCE —
    # a vector at version d deletes only rows written at versions < d
    # (Iceberg's sequence-number rule), which is what keeps an update's
    # own replacement rows alive while it kills the rows they replace.
    live_pvals = {p for ps in by_version.values() for p in ps}
    app_by_version: dict[int, list[str]] = {}
    for pval, avs in (manifest.get("appends") or {}).items():
        if pval in live_pvals:
            for av in avs:
                app_by_version.setdefault(int(av), []).append(pval)
    seq_aware = bool(app_by_version)

    def _tag_wv(df: DataFrame, wv: int) -> DataFrame:
        return df.withColumn("_wv", F.lit(wv)) if seq_aware else df

    pieces = []
    for v, pvals in sorted(by_version.items()):
        vdir = _resolve_vdir(root, manifest, v)
        spark.catalog.refreshByPath(vdir)
        pieces.append(
            _tag_wv(
                _normalize_types(
                    _map_physical(
                        spark.read.parquet(vdir), manifest, v
                    ).filter(
                        F.col(partition_col).cast("string").isin(pvals)
                    )
                ),
                v,
            )
        )
    for av, pvals in sorted(app_by_version.items()):
        adir = os.path.join(_resolve_vdir(root, manifest, av), "_append")
        spark.catalog.refreshByPath(adir)
        pieces.append(
            _tag_wv(
                _normalize_types(
                    _map_physical(
                        spark.read.parquet(adir), manifest, av
                    ).filter(
                        F.col(partition_col).cast("string").isin(sorted(pvals))
                    )
                ),
                av,
            )
        )
    def _project_schema(df: DataFrame) -> DataFrame:
        # the recorded schema pins names, order and types — including on
        # the all-partitions-skipped branch, whose backing directory may
        # predate a schema-widening merge
        schema_rec = manifest.get("schema")
        if schema_rec:
            df = df.select(
                *[
                    F.col(name)
                    if name in df.columns
                    else F.lit(None).cast(ddl).alias(name)
                    for name, ddl in schema_rec
                ]
            )
        return df

    def _row_filters(df: DataFrame) -> DataFrame:
        if predicate is not None:
            col, lo, hi = predicate
            df = df.filter(F.col(col).between(lo, hi))
        if eq_predicate is not None:
            col, val = eq_predicate
            df = df.filter(F.col(col) == F.lit(val))
        return df

    if not pieces:
        if (
            predicate is not None
            or eq_predicate is not None
            or partition_filter is not None
        ) and manifest["partitions"]:
            # every partition skipped by metadata: empty relation whose
            # schema matches a non-empty read exactly
            any_v = min(int(v) for v in manifest["partitions"].values())
            empty = spark.read.parquet(
                _resolve_vdir(root, manifest, any_v)
            ).limit(0)
            return _row_filters(_project_schema(empty))
        if schema_rec:
            # a fully-emptied table (every row deleted) is still a table:
            # it reads zero rows under the recorded schema and accepts
            # later writes — without this, one full DELETE would brick the
            # table forever (every writer starts with a snapshot read)
            empty = spark.createDataFrame(
                [],
                ", ".join(
                    "`{}` {}".format(n.replace("`", "``"), t)
                    for n, t in schema_rec
                ),
            )
            return _row_filters(empty)
        raise ValueError(f"versioned table at {root!r} has no live partitions")
    out = pieces[0]
    for p in pieces[1:]:
        # mixed per-version schemas appear after a schema-widening merge;
        # missing columns fill with NULLs here and the recorded schema
        # pins names, order and types
        out = out.unionByName(p, allowMissingColumns=True)
    dv = manifest.get("dv")
    if dv and dv.get("files"):
        # merge-on-read deletions: anti-join the deletion vectors on
        # (partition, key) — partition included so a key re-inserted
        # into a DIFFERENT partition after its delete is not re-deleted
        # by the stale vector (same-partition re-inserts cleared the
        # vector at rewrite time via _carry_dv).  One DV file can span
        # partitions; a rewrite clears only ITS partitions from
        # dv['files'] while the file stays referenced by the rest, so
        # each version's piece must be restricted to the partitions
        # that still reference it or the stale tuples re-delete
        # re-inserted keys.
        live_by_version: dict[int, list[str]] = {}
        for pval, vs in dv["files"].items():
            for dvv in vs:
                live_by_version.setdefault(int(dvv), []).append(pval)
        vecs = [
            spark.read.parquet(
                os.path.join(_resolve_vdir(root, manifest, dvv), "_dv")
            ).filter(
                F.col(partition_col).cast("string").isin(sorted(pvals))
            )
            for dvv, pvals in sorted(live_by_version.items())
        ]
        if seq_aware:
            # sequence-aware application: tag every vector tuple with its
            # commit version and anti-join on keys AND ``_dvv > _wv`` —
            # a vector deletes only rows OLDER than itself, so an
            # update's replacement rows (written at the vector's own
            # version) survive while the rows they replace die
            vecs = [
                piece.withColumn("_dvv", F.lit(dvv))
                for piece, (dvv, _p) in zip(vecs, sorted(live_by_version.items()))
            ]
            allv = vecs[0]
            for piece in vecs[1:]:
                allv = allv.unionByName(piece)
            probe = allv.select(
                partition_col, *dv["key_cols"], "_dvv"
            ).distinct().alias("_dvp")
            left = out.alias("_dvl")
            cond = F.col(f"_dvl.{partition_col}") == F.col(
                f"_dvp.{partition_col}"
            )
            for k in dv["key_cols"]:
                cond = cond & (F.col(f"_dvl.{k}") == F.col(f"_dvp.{k}"))
            cond = cond & (F.col("_dvp._dvv") > F.col("_dvl._wv"))
            out = left.join(probe, cond, "left_anti")
        else:
            allv = vecs[0]
            for piece in vecs[1:]:
                allv = allv.unionByName(piece)
            out = out.join(
                allv.select(partition_col, *dv["key_cols"]).distinct(),
                [partition_col, *dv["key_cols"]],
                "left_anti",
            )
    if seq_aware:
        out = out.drop("_wv")
    return _row_filters(_project_schema(out))


def merge_into_versioned(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key_cols: list[str],
    partition_col: str,
    commit_hook=None,
    allow_schema_evolution: bool = False,
    ref: str | None = None,
) -> int:
    """MERGE ``source`` into the versioned table at ``root``, atomically.

    Same merge semantics as :func:`..operators.merge.merge_into`
    (source-presence resolution — NULL-ing updates stick; partition-moving
    updates rewrite the key's old home; emptied partitions drop), but the
    rewritten partitions land in a fresh ``_v{N}`` directory and become
    visible only at the single manifest swap.  Returns the published
    version.

    ``commit_hook`` (tests only) runs after the data write, immediately
    before the checked commit — the injection point for crash and
    concurrent-writer interleavings.

    ``ref`` merges into a branch head instead of main (the write half of
    write-audit-publish — see :func:`create_branch`); main's pointer and
    data are untouched until :func:`fast_forward` publishes the branch.
    """
    from ..operators.merge import _affected_partitions, _merge_resolved

    manifest = read_manifest(root, ref=ref)
    target = read_snapshot(spark, root, partition_col, ref=ref)
    data_cols = list(target.columns)
    missing = set(data_cols) - set(source.columns)
    if missing:
        raise ValueError(f"source is missing target columns: {sorted(missing)}")
    new_cols = [c for c in source.columns if c not in data_cols]
    if new_cols and not allow_schema_evolution:
        raise ValueError(
            f"source adds columns {new_cols}; pass "
            "allow_schema_evolution=True to widen the table schema"
        )
    if new_cols:
        # ADD COLUMN via merge (Delta mergeSchema shape): existing rows in
        # rewritten partitions take typed NULLs; untouched partitions keep
        # their old files and the reader back-fills NULLs through the
        # manifest-recorded schema.  Note a change feed ACROSS the widening
        # boundary needs schema alignment first (snapshot_diff refuses
        # mismatched schemas by design).
        for c in new_cols:
            target = target.withColumn(
                c, F.lit(None).cast(source.schema[c].dataType)
            )
        data_cols = data_cols + new_cols

    affected = _affected_partitions(target, source, key_cols, partition_col)
    # validate partition values BEFORE claiming a version (ADVICE r7):
    # raising after the write would orphan a _v{N} directory whose live
    # _CLAIM marker blocks vacuum for claim_ttl_seconds — a rejected
    # write must leave no garbage, same contract as CHECK constraints
    raw_affected = _collect_partition_strings(affected, partition_col)
    _require_non_null_partitions(raw_affected)
    hit = _hit_partitions(target, partition_col, raw_affected)
    merged = _merge_resolved(hit, source, key_cols, data_cols)
    # CHECK constraints validate the rows being written (batch-bounded;
    # untouched partitions were validated by the write that produced them).
    # The constraint aggregate and the write are two consumers of the
    # merge join — checkpoint lazily: the constraint aggregate that
    # immediately follows materializes it inside its own job (one driver
    # action instead of two, guide §5), and the write reuses the rows.
    if manifest.get("constraints"):
        merged = merged.localCheckpoint(eager=False)
        _check_constraints(merged, manifest["constraints"])

    v = _claim_version(root)
    vdir = version_dir(root, v)
    # fresh claimed directory — no localCheckpoint needed: the plan's input
    # files are never the write target, the core advantage of immutability
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)

    _commit_ownership_rewrite(
        spark, root, manifest, v, vdir, partition_col,
        set(raw_affected), "merge", merged, commit_hook,
        ref=ref,
    )
    return v


def sync_versioned(
    spark: SparkSession,
    root: str,
    source: DataFrame,
    key_cols: list[str],
    partition_col: str,
    delete_condition=None,
    ref: str | None = None,
) -> int:
    """The full three-clause ANSI/Delta MERGE in one atomic commit:
    matched keys UPDATE to the source row (source NULLs included),
    source-only keys INSERT, and target rows **not matched by source**
    DELETE — unconditionally, or only where ``delete_condition`` is TRUE
    (FALSE and NULL keep the row, mirroring :func:`delete_from_versioned`).

    This is snapshot synchronization: with no condition the table
    becomes exactly ``source`` (keyed replication / backfill); with a
    condition it is the incremental flavor — "replace this slice with
    the source's view of it" (e.g. condition = the slice's date range).

    Cost model, stated honestly: the rewrite set is the source's
    partitions ∪ the touched keys' current homes ∪ the partitions
    holding a delete-eligible row.  An UNCONDITIONAL sync therefore
    rewrites every partition containing any row absent from the source —
    that is the semantics' true price (it must visit what it deletes),
    so at 100 TB pass a ``delete_condition`` that bounds the slice
    (partition-range predicates prune via the same affected-set
    discovery MERGE uses).  Returns the published version.
    """
    from ..operators.merge import _merge_resolved

    manifest = read_manifest(root, ref=ref)
    target = read_snapshot(spark, root, partition_col, ref=ref)
    data_cols = list(target.columns)
    missing = set(data_cols) - set(source.columns)
    if missing:
        raise ValueError(f"source is missing target columns: {sorted(missing)}")

    skeys = source.select(*key_cols).distinct()
    # NO broadcast hints on skeys anywhere in this function: a sync
    # source can be table-sized (the snapshot-replication use case), and
    # a forced broadcast of its distinct keys would blow the driver at
    # exactly that scale — this is why the affected-partition discovery
    # is inlined here instead of reusing merge's broadcast-hinted helper;
    # AQE still broadcasts genuinely small sources on its own
    doomed = target.join(skeys, key_cols, "left_anti")
    if delete_condition is not None:
        doomed = doomed.filter(delete_condition)
    old_homes = (
        target.join(skeys, key_cols, "leftsemi").select(partition_col).distinct()
    )
    affected = (
        source.select(partition_col)
        .distinct()
        .union(old_homes)
        .union(doomed.select(partition_col).distinct())
        .distinct()
    )
    # NULL partitions are rejected here, so the eqNullSafe arm of the
    # old broadcast join is unreachable and the shared literal-isin
    # selection is equality-identical; the affected list is
    # driver-bounded by the partition count — the same bound the collect
    # already imposes.
    raw_affected = _collect_partition_strings(affected, partition_col)
    _require_non_null_partitions(raw_affected)
    hit = _hit_partitions(target, partition_col, raw_affected)
    upserted = _merge_resolved(hit, source, key_cols, data_cols)
    # subtract the doomed keys: they are target-only, so removing them
    # from the merged output can never touch an upserted source row
    merged = upserted.join(doomed.select(*key_cols), key_cols, "left_anti")

    if manifest.get("constraints"):
        merged = merged.localCheckpoint(eager=False)
        _check_constraints(merged, manifest["constraints"])

    v = _claim_version(root)
    vdir = version_dir(root, v)
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)
    _commit_ownership_rewrite(
        spark, root, manifest, v, vdir, partition_col,
        set(raw_affected), "sync", merged, ref=ref,
    )
    return v


def optimize_partitions(
    spark: SparkSession,
    root: str,
    partition_col: str,
    order_col: str,
    min_files: int = 2,
    max_partitions: int | None = None,
) -> tuple[int, list[str]]:
    """Partial OPTIMIZE: rewrite only the partitions fragmented past
    ``min_files`` small files — what a real table format's OPTIMIZE does
    at 100 TB, where :func:`compact_versioned`'s full collapse would
    rewrite the entire table to fix a handful of hot partitions.

    Fragmentation is read from the live version directories' file
    listings (metadata, no data scan); the ``max_partitions`` cap bounds
    one maintenance tick's write amplification so OPTIMIZE can run as an
    incremental background loop (worst-fragmented first).  Selected
    partitions rewrite sorted by ``order_col`` into a fresh version under
    the usual ownership/commit rules; zone maps and bloom filters
    recompute for exactly the rewritten partitions.  Returns
    ``(published_version, rewritten_partition_values)`` — the current
    version unchanged with ``[]`` when nothing is fragmented.
    """
    from .compact import dataset_file_stats

    manifest = read_manifest(root)
    n_by_pval: dict[str, int] = {}
    by_version: dict[int, set[str]] = {}
    for pval, ver in manifest["partitions"].items():
        by_version.setdefault(int(ver), set()).add(pval)
    from ..operators.merge import _hive_partition_dir

    for ver, owned in by_version.items():
        # directory names are hive-ESCAPED; compare against the escaped
        # form of each owned raw value or escapable partitions silently
        # evade fragmentation detection forever
        dir_to_raw = {
            _hive_partition_dir(partition_col, pv): pv for pv in owned
        }
        for rel, (n_files, _b) in dataset_file_stats(
            _resolve_vdir(root, manifest, ver)
        ).items():
            pv = dir_to_raw.get(rel)
            if pv is not None:
                n_by_pval[pv] = n_by_pval.get(pv, 0) + n_files
    # merge-on-read append-deltas fragment a partition exactly like small
    # files (every read unions them in) — count them, or an update-heavy
    # partition never qualifies for OPTIMIZE no matter how bad its read
    # amplification gets
    ap_by_version: dict[int, set[str]] = {}
    for pval, avs in manifest.get("appends", {}).items():
        for av in avs:
            ap_by_version.setdefault(int(av), set()).add(pval)
    for av, owned in ap_by_version.items():
        adir = os.path.join(_resolve_vdir(root, manifest, av), "_append")
        dir_to_raw = {
            _hive_partition_dir(partition_col, pv): pv for pv in owned
        }
        for rel, (n_files, _b) in dataset_file_stats(adir).items():
            pv = dir_to_raw.get(rel)
            if pv is not None:
                n_by_pval[pv] = n_by_pval.get(pv, 0) + n_files
    frag = [
        (n, pv) for pv, n in n_by_pval.items() if n >= min_files
    ]
    frag.sort(reverse=True)  # worst-fragmented first under the cap
    chosen = [pv for _n, pv in frag[: max_partitions or len(frag)]]
    if not chosen:
        return manifest["version"], []

    target = read_snapshot(spark, root, partition_col)
    # the isin filter partition-prunes at planning time, so the rewrite
    # reads only the chosen partitions; one task per partition coalesces
    # its fragments into a single sorted file
    hit = (
        target.filter(F.col(partition_col).cast("string").isin(chosen))
        .repartition(len(chosen), F.col(partition_col))
        .sortWithinPartitions(partition_col, order_col)
    )

    v = _claim_version(root)
    vdir = version_dir(root, v)
    hit.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)
    written_counts = {
        str(p): n
        for p, n in _written_partition_counts(spark, vdir, partition_col).items()
    }
    chosen_set = set(chosen)
    parts = {
        p: (v if p in chosen_set else ver)
        for p, ver in manifest["partitions"].items()
    }
    rows = dict(manifest.get("rows", {}))
    rows.update(written_counts)
    new_manifest = {
        "version": v,
        "partitions": parts,
        "operation": f"optimize({len(chosen)} partitions)",
        "rows": {p: rows[p] for p in parts if p in rows},
    }
    if "constraints" in manifest:
        new_manifest["constraints"] = manifest["constraints"]
    if "schema" in manifest:
        new_manifest["schema"] = manifest["schema"]
    old_stats = manifest.get("stats")
    if old_stats:
        stats_cols = sorted(next(iter(old_stats.values())).keys())
        kept = {p: st for p, st in old_stats.items() if p not in chosen_set}
        kept.update(_partition_stats(spark, vdir, partition_col, stats_cols))
        new_manifest["stats"] = {p: kept[p] for p in parts if p in kept}
    old_blooms = manifest.get("bloom")
    if old_blooms:
        # rebuilt filters must share the table's recorded geometry —
        # kept and rebuilt bitmaps coexist in one manifest
        g_m, g_k = _manifest_bloom_geometry(manifest)
        bloom_cols = _bloom_col_union(old_blooms)
        keptb = {p: bm for p, bm in old_blooms.items() if p not in chosen_set}
        keptb.update(
            _partition_blooms(spark, vdir, partition_col, bloom_cols, m=g_m, k=g_k)
        )
        new_manifest["bloom"] = {p: keptb[p] for p in parts if p in keptb}
        if manifest.get("bloom_geometry"):
            new_manifest["bloom_geometry"] = dict(manifest["bloom_geometry"])
    carried_dv = _carry_dv(manifest, chosen_set)
    if carried_dv:
        new_manifest["dv"] = carried_dv
    carried_ap = _carry_appends(manifest, chosen_set)
    if carried_ap:
        new_manifest["appends"] = carried_ap
    if manifest.get("fallback_roots"):
        new_manifest["fallback_roots"] = list(manifest["fallback_roots"])
    for log in ("renames", "adds"):
        if manifest.get(log):
            new_manifest[log] = list(manifest[log])
    _commit_checked(root, new_manifest, manifest["version"])
    return v, sorted(chosen)


def cdc_apply_versioned(
    spark: SparkSession,
    root: str,
    changes: DataFrame,
    key_cols: list[str],
    partition_col: str,
    op_col: str = "_op",
) -> int:
    """Apply a mixed CDC batch — upserts AND key-level deletes — in ONE
    atomic commit (the ``WHEN MATCHED DELETE`` arm real CDC ingestion
    needs: an upstream feed ships ``U``/``I``/``D`` rows together, and
    applying them in two commits would expose an intermediate state).

    ``changes[op_col]`` ∈ {``"upsert"``, ``"delete"``}; delete rows need
    only their key columns populated.  Affected partitions are the union
    of both ops' footprints (a deleted key's current home rewrites
    without it); resolution is the standard source-presence merge with a
    final anti-join on the delete keys, so a key that is both upserted
    and deleted in one batch resolves to deleted — the last-writer
    convention, stated rather than accidental.  Constraints, schema,
    stats/bloom ownership and row counts follow the MERGE path.  Returns
    the published version.
    """
    from ..operators.merge import _affected_partitions, _merge_resolved

    manifest = read_manifest(root)
    target = read_snapshot(spark, root, partition_col)
    data_cols = list(target.columns)
    ups = changes.filter(F.col(op_col) == "upsert").drop(op_col)
    dels = changes.filter(F.col(op_col) == "delete").select(*key_cols).distinct()
    missing = set(data_cols) - set(ups.columns)
    if missing:
        raise ValueError(f"upsert rows are missing target columns: {sorted(missing)}")
    extra = [c for c in ups.columns if c not in data_cols]
    if extra:
        raise ValueError(
            f"CDC batch adds columns {extra}; widen the table first via "
            "merge_into_versioned(allow_schema_evolution=True)"
        )

    all_keys = ups.select(*key_cols).unionByName(dels).distinct()
    # affected = upsert rows' partitions ∪ every touched key's current home
    affected = _affected_partitions(
        target, ups.select(*data_cols), key_cols, partition_col
    ).union(
        target.join(F.broadcast(all_keys), key_cols, "leftsemi")
        .select(partition_col)
        .distinct()
    ).distinct()

    # ONE validation+discovery job: the distinct op values ride along the
    # affected-partition collect as a tagged union (guide §1.2 — the op
    # scan and the affected scan were two driver round-trips over the
    # same batch).  Both checks still run before any version claim, so a
    # refused CDC batch leaves no orphan directory / claim marker
    # (ADVICE r7).
    tagged = affected.select(
        F.lit(0).alias("_t"), F.col(partition_col).cast("string").alias("_val")
    ).union(
        changes.select(
            F.lit(1).alias("_t"), F.col(op_col).cast("string").alias("_val")
        ).distinct()
    )
    rows = tagged.collect()
    bad_ops = sorted(
        (
            r["_val"]
            for r in rows
            if r["_t"] == 1 and r["_val"] not in ("upsert", "delete")
        ),
        key=lambda v: (v is None, v or ""),
    )
    if bad_ops:
        raise ValueError(f"unknown CDC op values: {bad_ops}")
    raw_affected = [r["_val"] for r in rows if r["_t"] == 0]
    _require_non_null_partitions(raw_affected)

    hit = _hit_partitions(target, partition_col, raw_affected)
    merged = _merge_resolved(hit, ups.select(*data_cols), key_cols, data_cols)
    merged = merged.join(F.broadcast(dels), key_cols, "left_anti")
    if manifest.get("constraints"):
        merged = merged.localCheckpoint(eager=False)
        _check_constraints(merged, manifest["constraints"])

    v = _claim_version(root)
    vdir = version_dir(root, v)
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)

    _commit_ownership_rewrite(
        spark, root, manifest, v, vdir, partition_col,
        set(raw_affected), "cdc_apply", merged,
    )
    return v


def delete_from_versioned(
    spark: SparkSession,
    root: str,
    partition_col: str,
    condition,
    ref: str | None = None,
    mode: str = "copy_on_write",
    key_cols: list[str] | None = None,
    commit_hook=None,
) -> int:
    """DELETE FROM the versioned table, atomically and partition-pruned
    (the missing third of the DML surface next to MERGE and OPTIMIZE).

    ``mode="copy_on_write"`` (default): one pass finds the partitions
    holding a matching row, only those rewrite (survivors copy through
    into the fresh version directory), untouched partitions keep their
    manifest entry, and a fully-emptied partition drops.

    ``mode="merge_on_read"`` (requires ``key_cols``): the modern
    deletion-vector path — the commit writes ONLY the deleted rows'
    (partition, key) tuples as a vector file; no data partition is
    touched.  Write cost is O(deleted rows) instead of O(affected
    partitions), the trade every table format makes for delete-heavy
    workloads; readers anti-join the vectors (visible as extra read
    work until a rewrite), and any commit that rewrites a partition —
    MERGE/sync/CDC/OPTIMIZE/compact — materializes and clears its
    vectors.  ``key_cols`` must identify rows within a partition and
    must match the table's existing vectors.

    Both modes: SQL DELETE semantics for the predicate (TRUE goes,
    FALSE **and NULL** survive); a predicate matching nothing commits
    nothing.  Returns the published version.
    """
    if mode not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown delete mode {mode!r}")
    manifest = read_manifest(root, ref=ref)
    target = read_snapshot(spark, root, partition_col, ref=ref)
    if mode == "merge_on_read":
        if not key_cols:
            raise ValueError("merge_on_read delete requires key_cols")
        old_dv = manifest.get("dv")
        if old_dv and old_dv["key_cols"] != list(key_cols):
            raise ValueError(
                f"table vectors are keyed by {old_dv['key_cols']}; "
                f"got {list(key_cols)}"
            )
        doomed = target.filter(condition)
        # group by the Spark string rendering: these keys become the
        # manifest's dv/appends/deleted keys and must match the hive
        # encoding the read path compares against (see
        # _collect_partition_strings)
        counts_raw = (
            doomed.groupBy(
                F.col(partition_col).cast("string").alias(partition_col)
            )
            .count()
            .collect()
        )
        if not counts_raw:
            return manifest["version"]  # nothing to delete: no commit
        _require_non_null_partitions([r[0] for r in counts_raw])
        counts = {r[0]: int(r[1]) for r in counts_raw}

        v = _claim_version(root)
        doomed.select(partition_col, *key_cols).write.mode("overwrite").parquet(
            _dv_dir(root, v)
        )
        files = {
            p: list(vs) for p, vs in (old_dv or {}).get("files", {}).items()
        }
        deleted = dict((old_dv or {}).get("deleted", {}))
        for p, n in counts.items():
            files.setdefault(p, []).append(v)
            deleted[p] = int(deleted.get(p, 0)) + n
        new_manifest = dict(manifest)
        new_manifest["version"] = v
        new_manifest["operation"] = "delete_mor"
        new_manifest["dv"] = {
            "key_cols": list(key_cols),
            "files": files,
            "deleted": deleted,
        }
        if commit_hook is not None:
            commit_hook()
        _commit_checked(root, new_manifest, manifest["version"], ref=ref)
        return v

    affected_vals = {
        v
        for v in _collect_partition_strings(
            target.filter(condition).select(partition_col).distinct(),
            partition_col,
        )
        if v is not None  # NULL partitions never match the hive keys
    }
    if not affected_vals:
        return manifest["version"]  # nothing to delete: no empty commit

    hit = _hit_partitions(target, partition_col, affected_vals)
    # NULL-condition rows survive (ANSI DELETE), hence coalesce not ~cond
    survivors = hit.filter(F.coalesce(~condition, F.lit(True)))

    v = _claim_version(root)
    vdir = version_dir(root, v)
    survivors.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)
    _commit_ownership_rewrite(
        spark, root, manifest, v, vdir, partition_col,
        affected_vals, "delete", survivors, commit_hook, ref=ref,
    )
    return v


def update_versioned(
    spark: SparkSession,
    root: str,
    partition_col: str,
    condition,
    set_exprs: dict,
    ref: str | None = None,
    commit_hook=None,
    mode: str = "copy_on_write",
    key_cols: list[str] | None = None,
) -> int:
    """UPDATE ... SET on the versioned table, atomically and
    partition-pruned — the predicate-update quarter of the DML surface
    next to MERGE / DELETE / OPTIMIZE (generalizing the reference's
    whole-record PATCH upsert, ``src/Datalake2Anomali.py:397-404``, to
    per-column predicate updates).

    ``set_exprs`` maps existing column names to replacement Column
    expressions, evaluated per matched row and cast to the column's
    declared type (ANSI UPDATE assignment-cast semantics); unlisted
    columns pass through.  SQL UPDATE predicate semantics: TRUE rows
    update, FALSE **and NULL** rows survive unchanged; a predicate
    matching nothing commits nothing.

    ``mode="copy_on_write"`` (default) uses the shared ownership rules:
    the affected set is the matched rows' partitions PLUS — when
    ``set_exprs`` reassigns ``partition_col`` — the updated rows'
    destination partitions, so a partition-moving UPDATE rewrites both
    the old home and the new one while untouched partitions keep their
    manifest entry (the MERGE old-home discipline).

    ``mode="merge_on_read"`` (requires ``key_cols``) is the Delta/
    Iceberg deletion-vector UPDATE: the commit writes the matched rows'
    (partition, key) tuples as a vector file PLUS the replacement rows
    as an append-delta — no data partition rewrites, so write cost is
    O(updated rows) instead of O(affected partitions).  Readers apply
    vectors by SEQUENCE (a vector deletes only rows written before it),
    so the commit's own replacement rows survive; any later rewrite of
    a partition — MERGE/sync/CDC/OPTIMIZE/compact/CoW-UPDATE —
    materializes and clears its vectors and append-deltas together.
    Zone maps and bloom filters WIDEN with the appended rows (never
    tighten), so metadata skipping stays safe.  ``key_cols`` must
    identify rows within a partition, match the table's existing
    vectors, and may not themselves be assigned; ``partition_col``
    reassignment (a partition-moving update) also requires
    ``copy_on_write``.

    Returns the published version.
    """
    if mode not in ("copy_on_write", "merge_on_read"):
        raise ValueError(f"unknown update mode {mode!r}")
    manifest = read_manifest(root, ref=ref)
    target = read_snapshot(spark, root, partition_col, ref=ref)
    data_cols = list(target.columns)
    schema = {f.name: f.dataType for f in target.schema.fields}
    unknown = [c for c in set_exprs if c not in schema]
    if unknown:
        raise ValueError(
            f"UPDATE assigns unknown columns {sorted(unknown)}; "
            "UPDATE cannot add columns — use MERGE with schema evolution"
        )

    cond_true = F.coalesce(condition.cast("boolean"), F.lit(False))
    matched = target.filter(cond_true)
    if mode == "merge_on_read":
        return _update_merge_on_read(
            spark, root, partition_col, manifest, matched, set_exprs,
            schema, data_cols, key_cols, ref, commit_hook,
        )
    old_homes = matched.select(partition_col).distinct()
    if partition_col in set_exprs:
        new_homes = matched.select(
            set_exprs[partition_col].cast(schema[partition_col]).alias(partition_col)
        ).distinct()
        affected = old_homes.union(new_homes).distinct()
    else:
        affected = old_homes
    raw_affected = _collect_partition_strings(affected, partition_col)
    if not raw_affected:
        return manifest["version"]  # nothing matched: no empty commit
    _require_non_null_partitions(raw_affected)

    hit = _hit_partitions(target, partition_col, raw_affected)
    # one projection does both halves: matched rows take the SET exprs,
    # survivors pass through — no union, no second scan
    content = hit.select(
        *[
            F.when(cond_true, set_exprs[c].cast(schema[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in set_exprs
            else F.col(c)
            for c in data_cols
        ]
    )
    if manifest.get("constraints"):
        content = content.localCheckpoint(eager=False)
        _check_constraints(content, manifest["constraints"])

    v = _claim_version(root)
    vdir = version_dir(root, v)
    content.write.mode("overwrite").partitionBy(partition_col).parquet(vdir)
    spark.catalog.refreshByPath(vdir)
    _commit_ownership_rewrite(
        spark, root, manifest, v, vdir, partition_col,
        set(raw_affected), "update", content, commit_hook,
        ref=ref,
    )
    return v


def _update_merge_on_read(
    spark: SparkSession,
    root: str,
    partition_col: str,
    manifest: dict,
    matched: DataFrame,
    set_exprs: dict,
    schema: dict,
    data_cols: list[str],
    key_cols: list[str] | None,
    ref: str | None,
    commit_hook,
) -> int:
    """The merge-on-read arm of :func:`update_versioned`: deletion
    vector for the matched rows' pre-images + append-delta of their
    replacements, one atomic commit, no partition rewrites."""
    if not key_cols:
        raise ValueError("merge_on_read update requires key_cols")
    frozen = [c for c in set_exprs if c == partition_col or c in key_cols]
    if frozen:
        raise ValueError(
            f"merge_on_read UPDATE cannot reassign partition/key columns "
            f"{sorted(frozen)}; use mode='copy_on_write'"
        )
    old_dv = manifest.get("dv")
    if old_dv and old_dv["key_cols"] != list(key_cols):
        raise ValueError(
            f"table vectors are keyed by {old_dv['key_cols']}; "
            f"got {list(key_cols)}"
        )
    # materialize the matched set once: the vector write, the count, and
    # the replacement write below would otherwise each re-run the
    # snapshot scan + predicate (and diverge under a nondeterministic
    # predicate); the checkpoint is O(updated rows) — exactly what this
    # commit writes anyway.  Lazy: the count aggregate that immediately
    # follows materializes it inside its own job — one driver action per
    # commit instead of two (guide §5)
    matched = matched.localCheckpoint(eager=False)
    # Spark-rendered keys, for the same manifest-key consistency as the
    # MoR delete arm (see _collect_partition_strings)
    counts_raw = (
        matched.groupBy(
            F.col(partition_col).cast("string").alias(partition_col)
        )
        .count()
        .collect()
    )
    if not counts_raw:
        return manifest["version"]  # nothing matched: no empty commit
    _require_non_null_partitions([r[0] for r in counts_raw])
    counts = {r[0]: int(r[1]) for r in counts_raw}

    replacement = matched.select(
        *[
            set_exprs[c].cast(schema[c]).alias(c)
            if c in set_exprs
            else F.col(c)
            for c in data_cols
        ]
    )
    if manifest.get("constraints"):
        replacement = replacement.localCheckpoint(eager=False)
        _check_constraints(replacement, manifest["constraints"])

    v = _claim_version(root)
    matched.select(partition_col, *key_cols).write.mode("overwrite").parquet(
        _dv_dir(root, v)
    )
    adir = _append_dir(root, v)
    replacement.write.mode("overwrite").partitionBy(partition_col).parquet(adir)
    spark.catalog.refreshByPath(adir)

    new_manifest = dict(manifest)
    new_manifest["version"] = v
    new_manifest["operation"] = "update_mor"
    files = {p: list(vs) for p, vs in (old_dv or {}).get("files", {}).items()}
    deleted = dict((old_dv or {}).get("deleted", {}))
    for p, n in counts.items():
        files.setdefault(p, []).append(v)
        deleted[p] = int(deleted.get(p, 0)) + n
    new_manifest["dv"] = {
        "key_cols": list(key_cols),
        "files": files,
        "deleted": deleted,
    }
    ap = {p: list(vs) for p, vs in (manifest.get("appends") or {}).items()}
    for p in counts:
        ap.setdefault(p, []).append(v)
    new_manifest["appends"] = ap
    if manifest.get("rows"):
        # physical rows grow by the appended replacements; the matching
        # dv['deleted'] growth keeps the metadata-only logical count
        # (rows − deleted) invariant, as UPDATE must be.  A partition
        # with no recorded count stays unrecorded (still incomplete).
        rows = dict(manifest["rows"])
        for p, n in counts.items():
            if p in rows:
                rows[p] = int(rows[p]) + n
        new_manifest["rows"] = rows
    old_stats = manifest.get("stats")
    if old_stats:
        stats_cols = sorted(next(iter(old_stats.values())).keys())
        add = _partition_stats(spark, adir, partition_col, stats_cols)
        new_manifest["stats"] = {
            p: _widen_partition_stats(st, add[p]) if p in add else st
            for p, st in old_stats.items()
        }
    old_blooms = manifest.get("bloom")
    if old_blooms:
        # the appended rows' filter ORs into the existing bitmaps, so it
        # MUST be built at the table's recorded geometry
        g_m, g_k = _manifest_bloom_geometry(manifest)
        addb = _partition_blooms(
            spark, adir, partition_col,
            _bloom_col_union(old_blooms),
            m=g_m, k=g_k,
        )
        # a column whose appended rows are all NULL has no entry in the
        # append bloom — NULL never matches an equality probe, so the
        # existing filter stands unchanged (indexing addb[p][c] directly
        # would crash the commit after the data writes)
        new_manifest["bloom"] = {
            p: {
                c: _or_bloom_hex(bm[c], addb[p][c])
                if c in addb.get(p, {})
                else bm[c]
                for c in bm
            }
            if p in addb
            else bm
            for p, bm in old_blooms.items()
        }
    if commit_hook is not None:
        commit_hook()
    _commit_checked(root, new_manifest, manifest["version"], ref=ref)
    return v


def alter_table_columns(
    root: str,
    add: list[tuple[str, str]] | None = None,
    drop: list[str] | None = None,
    rename: dict[str, str] | None = None,
    ref: str | None = None,
) -> int:
    """Metadata-only column evolution — ADD / DROP / RENAME COLUMN with
    zero data rewritten (Iceberg's name-mapping schema evolution; what
    Delta needs column-mapping mode for).

    ``add``: ``(name, ddl_type)`` pairs — existing rows read the new
    column as NULL (the recorded-schema projection fills it), new writes
    carry it.  ``drop``: the recorded schema stops projecting the
    column; old files keep the bytes (reclaimed as partitions naturally
    rewrite).  ``rename``: ``{old: new}`` — recorded in the manifest's
    rename log, and every reader maps each piece's PHYSICAL names to the
    logical schema by replaying the renames committed after that piece
    was written (:func:`_apply_renames`), so files written before and
    after the rename read uniformly with no rewrite.

    Refused: touching ``partition_col`` is impossible to express here
    (the directory layout carries the name) — the partition column is
    whatever the caller passes to readers/writers, so this function
    refuses any add/drop/rename name that collides with a live
    deletion-vector key column, and any drop/rename of a column a CHECK
    constraint references.  Applies in drop → rename → add order within
    one commit.  Returns the published version."""
    import re as _re

    manifest = read_manifest(root, ref=ref)
    schema = [list(x) for x in manifest.get("schema") or []]
    if not schema:
        raise ValueError(
            f"table at {root!r} records no schema; cannot alter columns"
        )
    names = [n for n, _t in schema]
    dv_keys = set(manifest.get("dv", {}).get("key_cols", []))
    constraints = manifest.get("constraints", {})

    def _constraint_refs(col: str) -> list[str]:
        pat = _re.compile(rf"\b{_re.escape(col)}\b")
        return [name for name, sql in constraints.items() if pat.search(sql)]

    add = list(add or [])
    drop = list(drop or [])
    rename = dict(rename or {})
    if not (add or drop or rename):
        raise ValueError("nothing to alter: pass add, drop, and/or rename")

    for col in drop:
        if col not in names:
            raise ValueError(f"cannot drop unknown column {col!r}")
        if col in dv_keys:
            raise ValueError(
                f"column {col!r} keys the table's deletion vectors"
            )
        refs = _constraint_refs(col)
        if refs:
            raise ValueError(
                f"column {col!r} is referenced by constraints {refs}"
            )
    schema = [[n, t] for n, t in schema if n not in drop]
    names = [n for n, _t in schema]

    for old, new in rename.items():
        if old not in names:
            raise ValueError(f"cannot rename unknown column {old!r}")
        if new in names:
            raise ValueError(f"rename target {new!r} already exists")
        if old in dv_keys:
            raise ValueError(
                f"column {old!r} keys the table's deletion vectors"
            )
        refs = _constraint_refs(old)
        if refs:
            raise ValueError(
                f"column {old!r} is referenced by constraints {refs}"
            )
    schema = [
        [rename.get(n, n), t] for n, t in schema
    ]
    names = [n for n, _t in schema]

    for col, ddl in add:
        if col in names:
            raise ValueError(f"cannot add existing column {col!r}")
        schema.append([col, ddl])
        names.append(col)

    v = _claim_version(root)
    new_manifest = dict(manifest)
    new_manifest["version"] = v
    new_manifest["schema"] = schema
    parts = ", ".join(
        [f"drop {c}" for c in drop]
        + [f"rename {o}->{n}" for o, n in rename.items()]
        + [f"add {c}" for c, _t in add]
    )
    new_manifest["operation"] = f"alter({parts})"
    if rename:
        new_manifest["renames"] = list(manifest.get("renames", [])) + [
            {"from": o, "to": n, "v": v} for o, n in rename.items()
        ]
    if add:
        # the add log shadows a dropped predecessor's physical bytes in
        # never-rewritten pieces: a re-added name must read NULL there,
        # not resurrect the old column (_map_physical)
        new_manifest["adds"] = list(manifest.get("adds", [])) + [
            {"name": c, "v": v} for c, _t in add
        ]
    if manifest.get("stats"):
        new_manifest["stats"] = {
            p: {
                rename.get(c, c): rng
                for c, rng in st.items()
                if c not in drop
            }
            for p, st in manifest["stats"].items()
        }
    if manifest.get("bloom"):
        new_manifest["bloom"] = {
            p: {
                rename.get(c, c): bm
                for c, bm in bms.items()
                if c not in drop
            }
            for p, bms in manifest["bloom"].items()
        }
    _commit_checked(root, new_manifest, manifest["version"], ref=ref)
    return v


def compact_versioned(
    spark: SparkSession,
    root: str,
    partition_col: str,
    order_col: str | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_cols: tuple[str, str] | None = None,
    zorder_bits: int = 8,
) -> int:
    """Compact the live snapshot into one fresh version (atomic OPTIMIZE).

    Range-clusters on ``(partition_col, order_col)`` into size-targeted
    files exactly as :func:`.compact.compact_dataset`, but publishes via
    the manifest swap — readers never see the table half-compacted — and
    collapses the live-version set back to one, which is what keeps
    :func:`read_snapshot`'s per-version scan count bounded over a long
    merge history.  Returns the published version.

    ``zorder_cols=(a, b)`` (instead of ``order_col``) clusters on the
    Morton key of the two integer columns — Delta's ``OPTIMIZE ZORDER
    BY``: each file covers a bounded sub-range of BOTH dims, so
    row-group stats skip on predicates over either column, where a
    single-column sort bounds only one.  Both dims are rank-scaled to
    ``zorder_bits`` against their global min/max (one extra aggregate)
    before interleaving; the key is dropped before writing.
    """
    from .compact import dataset_file_stats
    from ..operators.layout import scale_to_bits, zorder_key2

    if (order_col is None) == (zorder_cols is None):
        raise ValueError(
            "pass exactly one of order_col or zorder_cols=(a, b)"
        )

    manifest = read_manifest(root)
    live_bytes = 0
    by_version: dict[int, set[str]] = {}
    for pval, ver in manifest["partitions"].items():
        by_version.setdefault(int(ver), set()).add(pval)
    for ver, owned in by_version.items():
        for rel, (_n, b) in dataset_file_stats(
            _resolve_vdir(root, manifest, ver)
        ).items():
            if rel.split("=", 1)[-1] in owned:
                live_bytes += b
    # merge-on-read sidecars (vectors + append-deltas) are live bytes the
    # compaction will fold in; omitting them undersizes n_ranges for
    # update-heavy tables
    for v in set(_dv_versions(manifest)) | set(_append_versions(manifest)):
        for sub in ("_dv", "_append"):
            side = os.path.join(_resolve_vdir(root, manifest, v), sub)
            for dirpath, _dn, files in os.walk(side):
                for f in files:
                    if f.endswith(".parquet"):
                        try:
                            live_bytes += os.path.getsize(
                                os.path.join(dirpath, f)
                            )
                        except OSError:
                            pass
    n_ranges = max(1, math.ceil(live_bytes / target_file_bytes))

    snap = read_snapshot(spark, root, partition_col)
    if zorder_cols is not None:
        a, b = zorder_cols
        bounds = snap.agg(
            F.min(a).alias("alo"), F.max(a).alias("ahi"),
            F.min(b).alias("blo"), F.max(b).alias("bhi"),
        )
        keyed = snap.crossJoin(F.broadcast(bounds)).withColumn(
            "_zk",
            zorder_key2(
                scale_to_bits(a, F.col("alo"), F.col("ahi"), zorder_bits),
                scale_to_bits(b, F.col("blo"), F.col("bhi"), zorder_bits),
            ),
        )
        clustered = (
            keyed.repartitionByRange(n_ranges, F.col(partition_col), F.col("_zk"))
            .sortWithinPartitions(partition_col, "_zk")
            .drop("_zk", "alo", "ahi", "blo", "bhi")
        )
    else:
        clustered = snap.repartitionByRange(
            n_ranges, F.col(partition_col), F.col(order_col)
        ).sortWithinPartitions(partition_col, order_col)
    v = _claim_version(root)
    vdir = version_dir(root, v)
    (
        clustered.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(vdir)
    )
    spark.catalog.refreshByPath(vdir)
    counts = {
        str(p): n
        for p, n in _written_partition_counts(spark, vdir, partition_col).items()
    }
    parts = sorted(counts)
    new_manifest = {
        "version": v,
        "partitions": {p: v for p in parts},
        "operation": "optimize",
        "schema": _schema_record(snap),
        "rows": counts,
    }
    if "constraints" in manifest:
        new_manifest["constraints"] = manifest["constraints"]
    old_stats = manifest.get("stats")
    if old_stats:
        stats_cols = sorted(next(iter(old_stats.values())).keys())
        new_manifest["stats"] = _partition_stats(
            spark, vdir, partition_col, stats_cols
        )
    old_blooms = manifest.get("bloom")
    if old_blooms:
        # compaction rewrites the WHOLE snapshot with no old bitmaps to
        # OR-merge against — the one point where re-sizing is free — so
        # RE-CHOOSE the geometry instead of pinning the init-time choice:
        # a table that grew past its initial key density escapes bloom
        # saturation here (code-review r14)
        bloom_cols = _bloom_col_union(old_blooms)
        g_m, g_k = _choose_bloom_geometry(spark, vdir, partition_col, bloom_cols)
        new_manifest["bloom"] = _partition_blooms(
            spark, vdir, partition_col, bloom_cols, m=g_m, k=g_k
        )
        new_manifest["bloom_geometry"] = {"m": g_m, "k": g_k}
    _commit_checked(root, new_manifest, manifest["version"])
    return v


def vacuum(
    root: str,
    retain_last: int = 1,
    claim_ttl_seconds: float = 3600.0,
    dry_run: bool = False,
    protect_versions: set[int] | None = None,
) -> list[int]:
    """Garbage-collect unreferenced version directories, keeping the last
    ``retain_last`` committed snapshots fully time-travel-readable.

    Protected from removal (VERDICT r6 #3 + ADVICE r6):

    - every version directory referenced by any of the ``retain_last``
      newest committed manifests (the current snapshot always counts),
      so :func:`read_snapshot` / :func:`table_changes` over retained
      versions survive a vacuum;
    - any directory whose ``_CLAIM.v{N}`` marker is younger than
      ``claim_ttl_seconds`` — an in-flight writer between its data write
      and its manifest swap; vacuuming it would let that writer commit a
      manifest pointing at deleted data.  Markers older than the TTL are
      crashed writers and are reclaimed with their directories.

    Historical manifests older than the retention window are deleted in
    the same pass, so a time-travel read past retention fails fast with a
    clear FileNotFoundError instead of an opaque missing-parquet error.
    Returns the removed version numbers.

    ``dry_run=True`` reports what a real vacuum would reclaim right now
    without touching anything — Delta's ``VACUUM ... DRY RUN``, the
    pre-flight every retention-policy change deserves.  (Stale crashed
    claim markers are left in place too; the reported set is computed
    with the same TTL rule a real run would apply.)
    """
    import shutil

    if retain_last < 1:
        raise ValueError("retain_last must be >= 1 (the current snapshot)")
    current = read_manifest(root)
    # opportunistic sweep of orphaned ref tmp files (ADVICE r9 low): a
    # creator that died between the tmp write and its unlink leaves an
    # invisible _reftmp-* forever.  The age gate has its own floor (15
    # minutes, NOT the claim TTL, which gate fixtures set to 0): the
    # hardened creation path exists precisely because a creator can
    # stall arbitrarily long between the tmp fsync and os.link (NFS
    # stall, GC pause), and sweeping a LIVE creator's tmp turns that
    # stall into a spurious FileNotFoundError at link time.  Litter
    # reclamation has no promptness requirement, so the floor is sized
    # for the pathological stall, not the common sub-second window.
    if not dry_run:
        tmp_ttl = max(claim_ttl_seconds, _REFTMP_SWEEP_FLOOR_SECONDS)
        for f in os.listdir(root):
            if f.startswith("_reftmp-"):
                p = os.path.join(root, f)
                try:
                    if time.time() - os.path.getmtime(p) > tmp_ttl:
                        os.unlink(p)
                except OSError:
                    pass
    # the retain_last window counts MAIN commits only: branch commits
    # share the history namespace, and letting them occupy window slots
    # would silently shrink main's guaranteed time-travel depth whenever
    # a branch is active (branch heads are pinned separately below;
    # branch INTERMEDIATE snapshots follow the same window as any
    # history — they are not main's retention problem)
    committed = {current["version"]}
    for name in os.listdir(root):
        m = _HIST.match(name)
        if m and read_manifest(root, int(m.group(1))).get("ref") is None:
            committed.add(int(m.group(1)))
    retained = sorted(committed)[-retain_last:]
    if current["version"] not in retained:
        retained.append(current["version"])

    # snapshots pinned by a named ref (branch head or tag) are retained
    # regardless of the retention window: a branch's unpublished work and
    # a tag's release pin must survive any vacuum, and a branch head also
    # references every directory its partition mapping points at
    refs = list_refs(root)
    ref_pinned: set[int] = {h["version"] for h in refs["branches"].values()}
    ref_pinned.update(refs["tags"].values())
    # externally pinned snapshots — catalog pins
    # (:func:`..io.catalog.catalog_pinned_versions`), shallow-clone
    # sources, or any retention policy beyond this table's own window —
    # are protected exactly like a named ref: the snapshot, everything
    # it references, and its history manifest all survive
    ref_pinned.update(int(v) for v in (protect_versions or ()))
    branch_heads = [
        read_manifest(root, ref=name) for name in refs["branches"]
    ]

    protect: set[int] = set()
    for snap_v in list(retained) + sorted(ref_pinned):
        try:
            snap = read_manifest(root, snap_v)
        except FileNotFoundError:
            # the current manifest may predate per-version history files
            snap = current if snap_v == current["version"] else None
        if snap is None:
            continue
        protect.add(snap_v)
        protect.update(int(v) for v in snap["partitions"].values())
        protect.update(_dv_versions(snap))  # deletion vectors of the snapshot
        protect.update(_append_versions(snap))  # MoR-update append-deltas
    for head in branch_heads:
        # a branch pointer is authoritative even if its history file is
        # somehow gone; protect everything its mapping references
        protect.add(int(head["version"]))
        protect.update(int(v) for v in head["partitions"].values())
        protect.update(_dv_versions(head))
        protect.update(_append_versions(head))

    now = time.time()
    for name in os.listdir(root):
        m = re.match(r"^_CLAIM\.v(\d+)$", name)
        if m:
            v = int(m.group(1))
            path = os.path.join(root, name)
            try:
                age = now - os.stat(path).st_mtime
            except FileNotFoundError:
                continue
            if age <= claim_ttl_seconds:
                protect.add(v)  # live in-flight writer
            elif not dry_run:
                try:
                    os.unlink(path)  # crashed writer; dir reclaimed below
                except FileNotFoundError:
                    pass

    removed = []
    for name in os.listdir(root):
        m = _VDIR.match(name)
        if m and int(m.group(1)) not in protect:
            v = int(m.group(1))
            if not dry_run:
                shutil.rmtree(os.path.join(root, name), ignore_errors=True)
                _release_claim(root, v)
            removed.append(v)
    if dry_run:
        return sorted(removed)
    # only manifests STRICTLY OLDER than the retention window go; a
    # concurrent writer may have committed a NEWER version since this
    # vacuum listed the directory, and deleting its fresh history file
    # would break time travel to the live current version
    threshold = min(retained)
    for name in os.listdir(root):
        m = _HIST.match(name)
        hv = int(m.group(1)) if m else None
        if (
            hv is not None
            and hv < threshold
            and hv not in retained
            and hv not in ref_pinned
        ):
            try:
                os.unlink(os.path.join(root, name))
            except FileNotFoundError:
                pass
    return sorted(removed)


def _require_non_null_partitions(vals) -> None:
    if any(v is None for v in vals):
        raise ValueError(
            "versioned tables require non-NULL partition values: the "
            "manifest is string-keyed and the pruned read cannot express "
            "the __HIVE_DEFAULT_PARTITION__ sentinel"
        )


def _collect_partition_strings(affected: DataFrame, partition_col: str) -> list:
    """The affected partition values as SPARK-rendered strings, in one
    collect.  Rendering with ``cast('string')`` on the cluster — not
    Python ``str()`` on the driver — keeps the hit-selection filter and
    the ownership comparison in :func:`_commit_ownership_rewrite`
    consistent with each other and with the hive string encoding the
    write itself produces (Python and Spark renderings diverge for
    boolean/float partition values: ``str(True)`` is ``'True'`` but the
    cast renders ``'true'``).  NULLs survive as ``None`` so
    :func:`_require_non_null_partitions` still sees them."""
    rows = affected.select(
        F.col(partition_col).cast("string").alias("_p")
    ).collect()
    return [r["_p"] for r in rows]


def _hit_partitions(target: DataFrame, partition_col: str, vals) -> DataFrame:
    """Planning-time selection of the affected partitions by literal
    ``isin`` over the already-collected, Spark-rendered values — shared
    by every copy-on-write DML path so the selection semantics cannot
    drift between them (guide §1.2: the values are already on the
    driver; a broadcast semi-join would recompute the whole affected
    subtree a second time inside the write job).  NULLs never match an
    ``isin`` and are dropped from the literal list (callers either
    rejected them already or deliberately leave NULL partitions
    untouched)."""
    return target.filter(
        F.col(partition_col)
        .cast("string")
        .isin(sorted(v for v in vals if v is not None))
    )


def _commit_ownership_rewrite(
    spark: SparkSession,
    root: str,
    manifest: dict,
    v: int,
    vdir: str,
    partition_col: str,
    affected_vals: set[str],
    operation: str,
    schema_df: DataFrame,
    commit_hook=None,
    ref: str | None = None,
) -> None:
    """Shared commit tail for every copy-on-write DML path (MERGE /
    DELETE / CDC apply): discover the written partitions with their row
    counts (one scan), apply the ownership rules — untouched partitions
    keep their version, rewritten/new take ``v``, affected-but-unwritten
    (emptied) drop — and maintain rows / zone maps / bloom filters /
    constraints / schema under those same rules before the checked
    commit.  Keeping this in one place is what stops the three DML
    writers from drifting apart."""
    # distinguish "the rewrite emptied everything" (no parquet files on
    # disk — legal, the partitions drop) from a failing scan (I/O error,
    # corrupt footer): treating the latter as emptied would commit a
    # manifest that silently drops partitions whose data write succeeded
    has_files = any(
        f.endswith(".parquet")
        for _d, _dn, fs in os.walk(vdir)
        for f in fs
    )
    if has_files:
        written_counts = {
            str(p): n
            for p, n in _written_partition_counts(
                spark, vdir, partition_col
            ).items()
        }
    else:
        written_counts = {}  # every affected partition fully emptied
    written_vals = set(written_counts)
    parts = {
        p: ver
        for p, ver in manifest["partitions"].items()
        if p not in affected_vals  # untouched partitions keep their version
    }
    parts.update({p: v for p in written_vals})  # rewritten + new partitions
    rows = {
        p: n
        for p, n in manifest.get("rows", {}).items()
        if p not in affected_vals
    }
    rows.update(written_counts)
    new_manifest = {
        "version": v,
        "partitions": parts,
        "operation": operation,
        "schema": _schema_record(schema_df),
        "rows": {p: rows[p] for p in parts if p in rows},
    }
    if "constraints" in manifest:
        new_manifest["constraints"] = manifest["constraints"]
    old_stats = manifest.get("stats")
    if old_stats:
        # zone maps follow the ownership rules: untouched keep theirs,
        # rewritten/new recompute from the fresh version dir, emptied drop
        stats_cols = sorted(next(iter(old_stats.values())).keys())
        kept = {p: st for p, st in old_stats.items() if p not in affected_vals}
        if written_vals:
            kept.update(_partition_stats(spark, vdir, partition_col, stats_cols))
        new_manifest["stats"] = {p: kept[p] for p in parts if p in kept}
    old_blooms = manifest.get("bloom")
    if old_blooms:
        # same-geometry rule as optimize: rebuilt filters must merge
        # cleanly with the kept ones
        g_m, g_k = _manifest_bloom_geometry(manifest)
        bloom_cols = _bloom_col_union(old_blooms)
        keptb = {p: bm for p, bm in old_blooms.items() if p not in affected_vals}
        if written_vals:
            keptb.update(
                _partition_blooms(
                    spark, vdir, partition_col, bloom_cols, m=g_m, k=g_k
                )
            )
        new_manifest["bloom"] = {p: keptb[p] for p in parts if p in keptb}
        if manifest.get("bloom_geometry"):
            new_manifest["bloom_geometry"] = dict(manifest["bloom_geometry"])
    carried_dv = _carry_dv(manifest, affected_vals)
    if carried_dv:
        new_manifest["dv"] = carried_dv
    carried_ap = _carry_appends(manifest, affected_vals)
    if carried_ap:
        new_manifest["appends"] = carried_ap
    if manifest.get("fallback_roots"):
        new_manifest["fallback_roots"] = list(manifest["fallback_roots"])
    for log in ("renames", "adds"):
        if manifest.get(log):
            # rewritten pieces carry logical names, but untouched
            # partitions' older files still need the physical->logical
            # mapping (and add-shadowing)
            new_manifest[log] = list(manifest[log])
    old_names = {n for n, _t in (manifest.get("schema") or [])}
    grown = [
        n
        for n, _t in new_manifest["schema"]
        if old_names and n not in old_names
    ]
    if grown:
        # a schema-widening write (merge allow_schema_evolution) is an
        # implicit ADD COLUMN: record it in the add log so a column that
        # was DROPPED earlier and now returns by this door reads NULL in
        # never-rewritten pieces instead of resurrecting stale bytes —
        # the same shadowing alter_table_columns' explicit add gets
        new_manifest["adds"] = list(new_manifest.get("adds", [])) + [
            {"name": n, "v": v} for n in grown
        ]
    if ref is not None:
        # branch commits carry their ref identity and the main version
        # they forked from — fast_forward's publish precondition
        new_manifest["ref"] = ref
        new_manifest["branch_base"] = manifest["branch_base"]
    if commit_hook is not None:
        commit_hook()
    _commit_checked(root, new_manifest, manifest["version"], ref=ref)


class TableFollower:
    """Incremental change-feed consumer over a versioned table — the
    table-as-a-stream-source shape (Delta's ``readChangeFeed`` +
    checkpoint, reduced to its cursor core, and the reference's T2
    high-watermark pull applied to table versions instead of timestamps).

    Each :meth:`poll` returns the CDF (with before/after images) from the
    cursor's last committed version to the table's current version, plus
    that target version; :meth:`commit` advances the durable cursor
    (atomic ``os.replace``).  Crash between apply and commit replays the
    same version span — at-least-once, turned into exactly-once effects
    by an idempotent apply (``views.apply_changes`` re-deriving from the
    same span, or ``streaming/incremental.exactly_once_batch``).  The
    first poll bootstraps: the starting snapshot arrives as pure
    ``added`` rows, so a downstream view needs no separate backfill path.

    Per-poll work is the diff of the two snapshot reads — bounded by the
    table, not its history; the followed versions must stay within
    :func:`vacuum`'s retention window (``retain_last`` must cover the
    polling lag), else poll fails with the standard vacuumed-version
    error rather than returning a gap.
    """

    def __init__(
        self,
        root: str,
        partition_col: str,
        key_cols: list[str],
        cursor_dir: str,
        ref: str | None = None,
    ):
        self.root = root
        self.partition_col = partition_col
        self.key_cols = list(key_cols)
        #: follow a branch head instead of main (audit-side consumers);
        #: committed branch versions are history files like any other, so
        #: the poll's table_changes span needs no ref awareness
        self.ref = ref
        os.makedirs(cursor_dir, exist_ok=True)
        self._path = os.path.join(cursor_dir, "version.cursor")

    def position(self) -> int | None:
        try:
            with open(self._path, encoding="utf-8") as fh:
                return int(fh.read().strip())
        except FileNotFoundError:
            return None

    def poll(self, spark: SparkSession) -> tuple[DataFrame | None, int]:
        """(changes, target_version); changes is None when caught up."""
        target = read_manifest(self.root, ref=self.ref)["version"]
        cur = self.position()
        if cur is None:
            snap = read_snapshot(
                spark, self.root, self.partition_col, version=target
            )
            compare = [c for c in snap.columns if c not in self.key_cols]
            dtypes = dict(snap.dtypes)
            boot = snap.select(
                *self.key_cols,
                F.lit("added").alias("change_type"),
                F.lit("").alias("changed_cols"),
                *[
                    F.lit(None).cast(dtypes[c]).alias(f"pre_{c}")
                    for c in compare
                ],
                *[F.col(c).alias(f"post_{c}") for c in compare],
            )
            return boot, target
        if cur == target:
            return None, target
        changes = table_changes(
            spark,
            self.root,
            self.partition_col,
            self.key_cols,
            cur,
            target,
            include_images=True,
        )
        return changes, target

    def commit(self, version: int) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(self._path), text=True)
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            fh.write(str(version))
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self._path)


def restore_version(root: str, version: int) -> int:
    """Delta-style RESTORE: make the table's CURRENT state equal snapshot
    ``version`` again — as a NEW commit, never by rewinding the pointer
    in place (history stays append-only; the restore itself is visible in
    :func:`table_history` and can itself be restored away).

    No data moves: the new manifest re-references the old snapshot's
    version directories, so the restored snapshot must still be within
    the :func:`vacuum` retention window (a reclaimed version raises the
    same clear FileNotFoundError as a time-travel read).  Runs under the
    optimistic-concurrency commit like every writer.  Returns the new
    version number.
    """
    current = read_manifest(root)
    target = read_manifest(root, version)  # raises if vacuumed/never committed
    needed = {int(x) for x in target["partitions"].values()}
    needed.update(_dv_versions(target))
    needed.update(_append_versions(target))
    for v in needed:
        if not os.path.isdir(_resolve_vdir(root, target, v)):
            raise FileNotFoundError(
                f"cannot restore to v{version}: its data directory _v{v} "
                "was vacuumed; only versions within the retention window "
                "are restorable"
            )
    v_new = _claim_version(root)
    manifest = {
        "version": v_new,
        "partitions": dict(target["partitions"]),
        "operation": f"restore(v{version})",
    }
    for extra in (
        "stats", "bloom", "bloom_geometry", "schema", "rows", "constraints",
        "dv", "appends", "fallback_roots", "renames", "adds",
    ):
        if extra in target:
            manifest[extra] = target[extra]
    _commit_checked(root, manifest, current["version"])
    return v_new


def clone_table(src_root: str, dst_root: str) -> int:
    """SHALLOW CLONE: a new independent table at ``dst_root`` whose
    manifest re-references the source's CURRENT version directories —
    zero data copied, created in one manifest write.  The clone records
    ``fallback_roots`` (the source root, plus the source's own fallbacks
    when cloning a clone) and every reader resolves a version directory
    locally first, then down the fallback chain
    (:func:`_resolve_vdir`); the clone's own writes claim fresh version
    numbers locally, so the two tables diverge freely after the clone
    (Delta's ``CREATE TABLE ... SHALLOW CLONE``).

    Retention contract: the clone references the source's immutable
    directories, so a source :func:`vacuum` aggressive enough to reclaim
    the cloned snapshot breaks the clone — the same caveat Delta
    documents.  A :func:`compact_versioned` on the clone rewrites it
    fully local and drops the fallback chain (the materialize escape
    hatch).  Returns the clone's version (the source's current)."""
    src = read_manifest(src_root)
    if os.path.exists(os.path.join(dst_root, MANIFEST)):
        raise FileExistsError(f"table already exists at {dst_root!r}")
    os.makedirs(dst_root, exist_ok=True)
    manifest = dict(src)
    manifest["operation"] = f"clone({src_root})"
    chain = [os.path.abspath(src_root)] + [
        p for p in src.get("fallback_roots", [])
    ]
    manifest["fallback_roots"] = chain
    # a hidden-partitioned source keeps its transform spec in a sidecar
    # next to the manifest; the spec is table metadata exactly like the
    # schema, so the clone must carry it or every read_hidden /
    # merge_into_hidden on the clone dies on a missing spec file.  A
    # non-hidden source conversely CLEARS any stale sidecar in dst (a
    # crashed earlier clone of a hidden source could have left one, and
    # inheriting it would silently mis-prune the new clone's reads).
    from .hidden import SPEC_FILE  # lazy: hidden imports publish

    spec_src = os.path.join(src_root, SPEC_FILE)
    spec_dst = os.path.join(dst_root, SPEC_FILE)
    if os.path.exists(spec_src):
        import shutil as _shutil

        _shutil.copyfile(spec_src, spec_dst)
    else:
        try:
            os.unlink(spec_dst)
        except FileNotFoundError:
            pass
    _commit_manifest(dst_root, manifest)
    return manifest["version"]


class MergeConflictError(RuntimeError):
    """A branch merge found partitions (or table metadata) changed on
    BOTH sides since the fork; merging would silently drop one side."""


def _side_touched(side: dict, base: dict) -> set[str]:
    """Partitions whose state differs from the fork base — owner version,
    merge-on-read vectors, or append-deltas; covers added and dropped
    partitions (present on one side only)."""
    def _dv(m: dict, p: str):
        dv = m.get("dv", {})
        return (dv.get("files", {}).get(p), dv.get("deleted", {}).get(p))

    out = set()
    for p in set(side["partitions"]) | set(base["partitions"]):
        if (
            side["partitions"].get(p) != base["partitions"].get(p)
            or _dv(side, p) != _dv(base, p)
            or side.get("appends", {}).get(p) != base.get("appends", {}).get(p)
        ):
            out.add(p)
    return out


def merge_branch(root: str, name: str) -> int:
    """Three-way merge of branch ``name`` into main — the
    write-audit-publish publish step that still works after main
    advanced, where :func:`fast_forward` must refuse.

    Conflict unit is the PARTITION: each side's touched set is every
    partition whose owner version, deletion-vector state, or
    append-delta state differs from the fork-base snapshot; a partition
    touched by both sides raises :class:`MergeConflictError` (rebase the
    branch), as does a table-level field — schema, constraints, vector
    key columns — changed differently on both sides.  Disjoint merges
    assemble the new main manifest per partition from whichever side
    touched it (base otherwise), with rows / zone maps / bloom filters /
    vectors / appends following the same per-partition selection, and
    publish as ONE new main commit under the usual compare-and-swap.
    The branch pointer is left in place.  Returns the new main version.
    """
    head = read_manifest(root, ref=name)
    cur = read_manifest(root)
    if cur["version"] == head["branch_base"]:
        return fast_forward(root, name)  # trivial: main never moved
    base = read_manifest(root, head["branch_base"])
    b_touch = _side_touched(head, base)
    m_touch = _side_touched(cur, base)
    conflicts = sorted(b_touch & m_touch)
    if conflicts:
        raise MergeConflictError(
            f"branch {name!r} and main both changed partitions "
            f"{conflicts[:10]}{'...' if len(conflicts) > 10 else ''}; "
            "rebase the branch and replay its writes"
        )
    # schema events (schema / rename log / add log) conflict with ANY
    # data write on the other side: the rename replay orders events by
    # version NUMBER, and a piece written concurrently on the other fork
    # can carry a version above the event's without having seen it —
    # its physical names would map wrongly (silently NULL columns).
    _meta_fields = ("schema", "constraints", "renames", "adds")
    b_meta = any(head.get(f) != base.get(f) for f in _meta_fields)
    m_meta = any(cur.get(f) != base.get(f) for f in _meta_fields)
    if (b_meta and m_touch) or (m_meta and b_touch):
        raise MergeConflictError(
            f"branch {name!r} or main changed table metadata "
            "(schema/constraints/rename log) while the other side wrote "
            "data; rebase the branch and replay"
        )

    def _pick_field(field: str):
        b_changed = head.get(field) != base.get(field)
        m_changed = cur.get(field) != base.get(field)
        if b_changed and m_changed and head.get(field) != cur.get(field):
            raise MergeConflictError(
                f"branch {name!r} and main changed {field!r} differently"
            )
        return head.get(field) if b_changed else cur.get(field)

    def _winner(p: str) -> dict:
        return head if p in b_touch else (cur if p in m_touch else base)

    # Bloom bitmaps are only probe-able at the geometry they were built
    # with, and compact_versioned (main-only) may have re-chosen the
    # table geometry since the fork — so a branch partition's bitmap can
    # be sized differently from the geometry this merge records.  Keep a
    # side's per-partition bloom ONLY when that side's effective
    # geometry equals the merged manifest's: a dropped bloom merely
    # disables partition skipping, while a mismatched one probes to
    # false NEGATIVES and read_snapshot would silently drop the
    # partition's matching rows (ADVICE r14).
    merged_geo = _manifest_bloom_geometry(
        {"bloom_geometry": _pick_field("bloom_geometry")}
    )

    all_pvals = (
        set(head["partitions"]) | set(cur["partitions"]) | set(base["partitions"])
    )
    parts: dict[str, int] = {}
    rows: dict[str, int] = {}
    stats: dict[str, dict] = {}
    blooms: dict[str, dict] = {}
    dv_files: dict[str, list] = {}
    dv_deleted: dict[str, int] = {}
    appends: dict[str, list] = {}
    for p in all_pvals:
        w = _winner(p)
        if p not in w["partitions"]:
            continue  # dropped by the side that touched it
        parts[p] = w["partitions"][p]
        if p in w.get("rows", {}):
            rows[p] = w["rows"][p]
        if p in w.get("stats", {}):
            stats[p] = w["stats"][p]
        if p in w.get("bloom", {}) and _manifest_bloom_geometry(w) == merged_geo:
            blooms[p] = w["bloom"][p]
        wdv = w.get("dv", {})
        if p in wdv.get("files", {}):
            dv_files[p] = list(wdv["files"][p])
            dv_deleted[p] = int(wdv.get("deleted", {}).get(p, 0))
        if p in w.get("appends", {}):
            appends[p] = list(w["appends"][p])

    v_new = _claim_version(root)
    manifest: dict = {
        "version": v_new,
        "partitions": parts,
        "operation": f"merge_branch({name}@v{head['version']})",
    }
    for field in (
        "schema", "constraints", "bloom_geometry", "fallback_roots",
        "renames", "adds"
    ):
        val = _pick_field(field)
        if val is not None:
            manifest[field] = val
    if rows:
        manifest["rows"] = rows
    if stats:
        manifest["stats"] = stats
    if blooms:
        manifest["bloom"] = blooms
    if dv_files:
        key_sets = [
            m["dv"]["key_cols"] for m in (head, cur) if m.get("dv")
        ]
        if any(k != key_sets[0] for k in key_sets):
            raise MergeConflictError(
                f"branch {name!r} and main carry vectors with different "
                "key columns"
            )
        manifest["dv"] = {
            "key_cols": key_sets[0],
            "files": dv_files,
            "deleted": dv_deleted,
        }
    if appends:
        manifest["appends"] = appends
    _commit_checked(root, manifest, cur["version"])
    return v_new


def create_branch(root: str, name: str, from_version: int | None = None) -> int:
    """Create branch ``name`` pointing at the current main snapshot (or
    ``from_version``) — the write half of write-audit-publish (Iceberg
    refs / Delta branch semantics, reduced to a second pointer file).

    A branch is a named head over the SAME version-number space: writes
    through ``merge_into_versioned(..., ref=name)`` /
    ``delete_from_versioned(..., ref=name)`` commit real versions (data
    dirs + immutable history manifests) but swap ``_BRANCH.{name}.json``
    instead of ``_MANIFEST.json``, so main's readers never see them until
    :func:`fast_forward` publishes the branch head.  No data is copied at
    creation — the pointer re-references the fork snapshot's directories,
    and :func:`vacuum` protects every branch-referenced version.

    ``branch_base`` — the publish precondition :func:`fast_forward`
    checks — is main's CURRENT version at branch creation, even when
    ``from_version`` names an older snapshot: branching off history and
    publishing is a deliberate rewind (the restore workflow through a
    branch), and the guard's job is only to catch main moving UNDER the
    branch after it was cut, never to second-guess the starting point.

    Returns the fork version.  Refuses an existing branch name (the
    pointer enters its final name by hard link — creation is atomic
    among racing creators and crash-safe).
    """
    current = read_manifest(root)
    fork = current if from_version is None else read_manifest(root, from_version)
    head = dict(fork)
    head["ref"] = name
    head["branch_base"] = current["version"]
    _write_ref_atomic(root, _branch_file(name), head)
    return fork["version"]


def fast_forward(root: str, name: str) -> int:
    """Publish branch ``name``'s head to main as a NEW commit — the
    publish step of write-audit-publish.  Like :func:`restore_version`,
    no data moves: the new main manifest re-references the branch head's
    version directories; history stays append-only and the publish is
    itself restorable away.

    Precondition (checked under the commit lock): main must still be at
    the version it held when the branch was CREATED (``branch_base`` —
    see :func:`create_branch` for why that is the creation-time version
    even under ``from_version``).  If main advanced since, raises
    :class:`ConcurrentWriteError` — the branch is stale and must be
    rebased (recreate it from the new main and replay the writes); a
    silent merge here would drop main's concurrent commits.  The branch
    pointer is left in place (delete it explicitly when done).

    Returns the new main version.
    """
    head = read_manifest(root, ref=name)
    base = head["branch_base"]
    v_new = _claim_version(root)
    manifest = {
        "version": v_new,
        "partitions": dict(head["partitions"]),
        "operation": f"publish({name}@v{head['version']})",
    }
    for extra in (
        "stats", "bloom", "bloom_geometry", "schema", "rows", "constraints",
        "dv", "appends", "fallback_roots", "renames", "adds",
    ):
        if extra in head:
            manifest[extra] = head[extra]
    _commit_checked(root, manifest, base)
    return v_new


def delete_branch(root: str, name: str) -> None:
    """Drop branch ``name``'s pointer.  Versions only the branch
    referenced become unprotected garbage for the next :func:`vacuum`."""
    try:
        os.unlink(os.path.join(root, _branch_file(name)))
    except FileNotFoundError:
        raise FileNotFoundError(
            f"versioned table at {root!r} has no branch {name!r}"
        ) from None


def create_tag(root: str, name: str, version: int | None = None) -> int:
    """Tag a committed snapshot with an immutable name (release pins:
    ``create_tag(root, "train-v1")`` → ``read_snapshot(..., version=
    read_tag(root, "train-v1"))`` forever reproduces the training set).
    Tags cannot be re-pointed (link-into-place creation is exclusive);
    :func:`vacuum` keeps tagged
    snapshots readable regardless of ``retain_last``.  Returns the tagged
    version."""
    v = read_manifest(root, version)["version"]  # validates it committed
    _write_ref_atomic(root, _tag_file(name), {"version": v})
    return v


def read_tag(root: str, name: str) -> int:
    """The version a tag pins."""
    try:
        with open(os.path.join(root, _tag_file(name)), encoding="utf-8") as fh:
            return int(json.load(fh)["version"])
    except FileNotFoundError:
        raise FileNotFoundError(
            f"versioned table at {root!r} has no tag {name!r}"
        ) from None


def delete_tag(root: str, name: str) -> None:
    try:
        os.unlink(os.path.join(root, _tag_file(name)))
    except FileNotFoundError:
        raise FileNotFoundError(
            f"versioned table at {root!r} has no tag {name!r}"
        ) from None


def list_refs(root: str) -> dict:
    """``{"branches": {name: {"version", "branch_base"}}, "tags":
    {name: version}}`` — every named ref on the table."""
    out: dict = {"branches": {}, "tags": {}}
    for fname in sorted(os.listdir(root)):
        m = _BRANCH_FILE.match(fname)
        if m:
            with open(os.path.join(root, fname), encoding="utf-8") as fh:
                head = json.load(fh)
            out["branches"][m.group(1)] = {
                "version": head["version"],
                "branch_base": head["branch_base"],
            }
            continue
        m = _TAG_FILE.match(fname)
        if m:
            with open(os.path.join(root, fname), encoding="utf-8") as fh:
                out["tags"][m.group(1)] = int(json.load(fh)["version"])
    return out


def version_as_of_timestamp(root: str, ts: float, ref: str | None = None) -> int:
    """AS OF TIMESTAMP resolution: the newest committed snapshot **of the
    given pointer** (main by default, a branch with ``ref``) whose
    recorded commit wall-clock is ≤ ``ts`` (epoch seconds) — Delta's
    ``timestampAsOf`` over the per-version history files.  Commits of
    OTHER refs are excluded: a branch's unpublished commits share the
    history namespace but must never resolve for a main reader (that
    would leak write-audit-publish data around :func:`fast_forward`).
    Stamps are forced strictly increasing per pointer, so per-ref
    resolution is total; raises if ``ts`` predates the first retained
    commit of the ref (or the window was vacuumed past it — same
    retention trade as version time travel)."""
    want_ref = ref  # None == main (manifests record no "ref" key)
    best: tuple[float, int] | None = None
    for name in os.listdir(root):
        m = _HIST.match(name)
        if not m:
            continue
        snap = read_manifest(root, int(m.group(1)))
        if snap.get("ref") != want_ref:
            continue
        at = snap.get("committed_at")
        if at is not None and at <= ts and (best is None or at > best[0]):
            best = (at, snap["version"])
    if best is None:
        where = f"branch {ref!r} of table" if ref else "table"
        raise FileNotFoundError(
            f"versioned {where} at {root!r} has no retained commit at or "
            f"before timestamp {ts}; the window may have been vacuumed"
        )
    return best[1]


def describe_detail(root: str) -> dict:
    """DESCRIBE DETAIL: one metadata-only summary of the current
    snapshot — version, commit time, operation, partition/row counts
    (from the manifest, no file opens), live version-directory set, total
    live bytes (one filesystem walk of live dirs, the only I/O here),
    schema, constraints, and the table's named refs."""
    manifest = read_manifest(root)
    live_versions = sorted(
        {int(v) for v in manifest["partitions"].values()}
        | set(_dv_versions(manifest))
        | set(_append_versions(manifest))
    )
    size = 0
    for v in live_versions:
        for dirpath, _dn, files in os.walk(_resolve_vdir(root, manifest, v)):
            for f in files:
                try:
                    size += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
    return {
        "version": manifest["version"],
        "committed_at": manifest.get("committed_at"),
        "operation": manifest.get("operation", "write"),
        "n_partitions": len(manifest["partitions"]),
        "n_rows": _manifest_rowcount(manifest),
        "live_versions": live_versions,
        "size_bytes": size,
        "schema": manifest.get("schema"),
        "constraints": manifest.get("constraints", {}),
        "refs": list_refs(root),
    }


def snapshot_rowcount(root: str, version: int | None = None) -> int:
    """SELECT COUNT(*) answered from metadata alone — no file opens.
    Every commit records per-partition row counts (gathered by the same
    scan that finds the written partitions), so the table's cardinality
    is a manifest sum — physical rows minus merge-on-read deletions —
    exactly the metadata-only count Delta/Iceberg serve.  Raises if the
    manifest predates row-count recording."""
    manifest = read_manifest(root, version)
    n = _manifest_rowcount(manifest)
    if n is None:
        raise ValueError(
            f"manifest v{manifest['version']} at {root!r} lacks complete "
            "row counts (written before metadata counts); count with a scan"
        )
    return n


def table_history(root: str) -> list[dict]:
    """DESCRIBE HISTORY: one record per committed snapshot still
    addressable (within vacuum retention), oldest first — version,
    recorded operation (manifests written before the operation field
    default to "write"), live-partition count, and the set of version
    directories the snapshot references."""
    out = []
    for name in sorted(os.listdir(root)):
        m = _HIST.match(name)
        if not m:
            continue
        snap = read_manifest(root, int(m.group(1)))
        out.append(
            {
                "version": snap["version"],
                "operation": snap.get("operation", "write"),
                "ref": snap.get("ref", "main"),
                "committed_at": snap.get("committed_at"),
                "n_partitions": len(snap["partitions"]),
                "n_rows": _manifest_rowcount(snap),
                "refs": sorted({int(v) for v in snap["partitions"].values()}),
            }
        )
    return sorted(out, key=lambda r: r["version"])


def history_df(spark: SparkSession, root: str) -> DataFrame:
    """:func:`table_history` as a typed DataFrame — Iceberg's ``history``
    metadata table, queryable/joinable like any relation."""
    rows = [
        (
            h["version"],
            h["operation"],
            h["ref"],
            h["committed_at"],
            h["n_partitions"],
            h["n_rows"],
        )
        for h in table_history(root)
    ]
    return spark.createDataFrame(
        rows,
        "version long, operation string, ref string, committed_at double, "
        "n_partitions long, n_rows long",
    )


def partitions_df(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """The snapshot's partition map as a typed DataFrame — partition
    value, owning version directory, recorded PHYSICAL row count, the
    partition's outstanding merge-on-read deletions (``n_deleted``; the
    logical count is their difference), and (when zone maps exist) each
    stats column's [min, max] as JSON.  Iceberg's ``partitions`` metadata
    table; driver state = the manifest, which is already
    partition-count-bounded."""
    manifest = read_manifest(root, version, ref=ref)
    rows_rec = manifest.get("rows", {})
    stats = manifest.get("stats", {})
    deleted = manifest.get("dv", {}).get("deleted", {})
    rows = [
        (
            p,
            int(v),
            int(rows_rec[p]) if p in rows_rec else None,
            int(deleted.get(p, 0)),
            json.dumps(stats[p], sort_keys=True) if p in stats else None,
        )
        for p, v in sorted(manifest["partitions"].items())
    ]
    return spark.createDataFrame(
        rows,
        "partition string, owner_version long, n_rows long, "
        "n_deleted long, stats_json string",
    )


def files_df(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Live data files of the snapshot as a typed DataFrame — Iceberg's
    ``files`` metadata table: path, owning partition value, owning
    version, size.  One filesystem walk of exactly the live version
    directories (the snapshot's real I/O footprint, which is what a
    maintenance job sizing an OPTIMIZE wants to query)."""
    from ..operators.merge import _hive_partition_dir

    manifest = read_manifest(root, version, ref=ref)
    owned: dict[int, set[str]] = {}
    for p, v in manifest["partitions"].items():
        owned.setdefault(int(v), set()).add(p)
    out = []
    for v, pvals in sorted(owned.items()):
        vdir = _resolve_vdir(root, manifest, v)
        # directory names are hive-ESCAPED (':' → '%3A' etc. — e.g. the
        # 'g1:' generation prefixes of evolved specs); match the escaped
        # form of each owned raw value and emit the RAW value, exactly as
        # optimize_partitions does, or escapable partitions vanish from
        # the files view (ADVICE r8 medium)
        esc_to_raw = {
            _hive_partition_dir("c", pv).split("=", 1)[1]: pv for pv in pvals
        }
        for dirpath, _dn, files in os.walk(vdir):
            rel = os.path.relpath(dirpath, vdir)
            pval = (
                esc_to_raw.get(rel.split("=", 1)[1]) if "=" in rel else None
            )
            if pval is None and "=" in rel:
                continue  # partition now owned by a newer version
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                try:
                    size = os.path.getsize(full)
                except OSError:
                    continue
                out.append((full, pval, v, size))
    return spark.createDataFrame(
        out, "path string, partition string, owner_version long, size_bytes long"
    )


def table_changes(
    spark: SparkSession,
    root: str,
    partition_col: str,
    key_cols: list[str],
    v_from: int,
    v_to: int,
    include_images: bool = False,
) -> DataFrame:
    """Change data feed between two committed versions: the row-level
    added/removed/changed classification of :func:`..operators.quality
    .snapshot_diff` applied to the two snapshots' versioned reads — what
    a downstream consumer replays to catch up from ``v_from`` to
    ``v_to`` without rescanning the table's full history (Delta CDF /
    Iceberg changelog shape, derived rather than stored: correct for any
    pair of live versions, at the cost of diffing two snapshot reads).

    Schema evolution inside the span is tolerated: the old snapshot is
    aligned to ``v_to``'s logical schema before diffing — renames replay
    through the same event log pieces use (:func:`_map_physical`, with
    the old snapshot treated as one piece written at ``v_from``),
    columns added in the span surface as typed NULL on the old side
    (their new values report as ``changed``), and columns dropped in
    the span leave the diff (the data no longer has them).  ``key_cols``
    are ``v_to``'s names.
    """
    from ..operators.quality import snapshot_diff

    to_manifest = read_manifest(root, v_to)
    # ``partition_col`` is v_to's name; if the partition column was
    # RENAMED inside the span, the v_from snapshot only knows the old
    # name — derive it by replaying the span's rename events backwards
    # from v_to's name, or the old-side read throws UNRESOLVED_COLUMN
    # and any follower span crossing the rename wedges (ADVICE r10).
    from_pcol = partition_col
    for _v, kind, ev in reversed(_schema_events(to_manifest)):
        if kind == 0 and v_from < int(ev["v"]) <= v_to and ev["to"] == from_pcol:
            from_pcol = ev["from"]
    # Manifest-level pruning: a partition whose owner version,
    # deletion-vector state and append-delta state are IDENTICAL in both
    # manifests references the same immutable directories on both sides
    # and cannot contribute a diff row — skip it on both reads.  This is
    # what makes the derived CDF delta-sized instead of table-sized: a
    # span that churned 3 of 10,000 partitions diffs 3 partitions.
    # Conservative by construction (any data change rewrites the
    # partition / its DV / its appends and so flips manifest state);
    # a content-identical rewrite (compaction) is included and simply
    # diffs to nothing.
    from_manifest = read_manifest(root, v_from)
    churned = _side_touched(to_manifest, from_manifest)
    _pf = lambda p: p in churned  # noqa: E731
    old = read_snapshot(
        spark, root, from_pcol, version=v_from, partition_filter=_pf
    )
    new = read_snapshot(
        spark, root, partition_col, version=v_to, partition_filter=_pf
    )
    # alignment must trigger on IN-SPAN schema events even when the two
    # column-name lists coincide: a drop+re-add of the same name leaves
    # the lists equal while the old side still carries the DEAD column's
    # values — diffing them would report every row changed against
    # pre-images of an identity that no longer exists
    span_events = [
        e
        for _v, _k, e in _schema_events(to_manifest)
        if v_from < int(e["v"]) <= v_to
    ]
    if old.columns != new.columns or span_events:
        old = _map_physical(old, to_manifest, written_v=v_from)
        dtypes = dict(new.dtypes)
        old = old.select(
            *[
                F.col(c)
                if c in old.columns
                else F.lit(None).cast(dtypes[c]).alias(c)
                for c in new.columns
            ]
        )
    return snapshot_diff(old, new, key_cols, include_images=include_images)
