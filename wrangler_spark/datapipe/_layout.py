"""Versioned-snapshot layout for persisted indexes and state.

Every materialize-once artifact in the package (bloom/minhash/embedding/
IVF indexes, retention/vocab/report state) is a directory of parquet
datasets plus a 1-row ``meta``. The original layout was FLAT —
``<path>/<dataset>`` — which makes every rebuild-in-place and every
compaction a multi-directory swap with no atomic step: a crash between
the ``meta`` write and the ``buckets`` write leaves NEW-geometry meta
over OLD-geometry buckets, and probes silently miss pairs (the one
failure an index must never have), while a probe running concurrently
with a compaction can read a half-swapped dataset.

The versioned layout closes both holes with one mechanism, the
minimal form of the snapshot pattern every table format (Iceberg/Delta/
Hudi) builds on:

- a BUILD writes all datasets into ``<path>/v_NNNNNN/`` (invisible to
  readers), then creates the empty ``v_NNNNNN/_COMMITTED`` marker —
  a single file create, the only atomicity the filesystem must provide;
- a READER resolves the highest committed version and plans against
  those concrete paths — a build or compaction running concurrently
  writes elsewhere and flips visibility only at its commit, and files a
  running probe already resolved are never deleted out from under it
  (vacuum keeps the previous committed version precisely as that grace
  period);
- an APPEND (the log-structured state family) lands in the CURRENT
  resolved root, so appends survive compaction cadences;
- a crash at ANY point leaves either the old committed version or the
  new one readable — never a mix, never a missing dataset.

Flat legacy indexes keep working: ``resolve`` returns ``path`` itself
when no committed version exists, and the first compaction migrates the
artifact into ``v_000001`` without touching the flat datasets (vacuum
removes them once a committed version supersedes them).

Single-writer contract (ENFORCED by a lease): builds, appends, and
compactions of the SAME artifact must not race each other — probes may
race any of them freely. The enforcement is a create-exclusive
``<path>/_LOCK`` file: ``begin_version`` (and the append family, via
:func:`writer_lease`) acquires it, ``commit_version`` /
``abandon_version`` releases it, and a SECOND writer fails loudly with
:class:`ConcurrentWriterError` instead of silently interleaving its
files under the winner's version. A writer that crashed without
releasing leaves a stale lock; a later acquire steals it once it is
older than ``ttl_sec`` (default 1 h — longer than any sane build, so a
steal implies a dead writer, not a slow one). The steal itself is
best-effort (two stealers of the SAME stale lock can both win, the
classic lease caveat) — it restores liveness after a crash, while the
common-case create-exclusive acquire is fully atomic.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import SparkSession

_VERSION_RE = re.compile(r"^v_(\d{6,})$")
_MARKER = "_COMMITTED"
_LOCK = "_LOCK"

#: a lock older than this is presumed to belong to a crashed writer and
#: may be stolen by the next acquire.
DEFAULT_LEASE_TTL_SEC = 3600


class ConcurrentWriterError(RuntimeError):
    """A second writer (build / append / compaction) tried to acquire an
    artifact whose lease is held and not yet stale."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _version_dirs(fs, root, jvm) -> list[tuple[int, str, bool]]:
    """(number, name, committed) for every ``v_NNNNNN`` dir under root,
    ascending by number. Empty when root doesn't exist (fresh path)."""
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        if not st.isDirectory():
            continue
        m = _VERSION_RE.match(st.getPath().getName())
        if not m:
            continue
        marker = jvm.org.apache.hadoop.fs.Path(st.getPath(), _MARKER)
        out.append((int(m.group(1)), st.getPath().getName(), fs.exists(marker)))
    return sorted(out)


def resolve(spark: SparkSession, path: str, version: int | None = None) -> str:
    """The root directory dataset READS and APPENDS should target: the
    highest COMMITTED version dir, else ``path`` itself (flat legacy
    layout / fresh path). Resolution happens at plan-build time, so a
    compaction that commits afterwards never swaps files under a
    running read.

    ``version`` pins the read to a specific committed snapshot (time
    travel): versions survive until :func:`vacuum` reclaims them, so
    "what did this state say before yesterday's compaction" is a normal
    read, not a restore. Append semantics set the snapshot granularity:
    appends land in the CURRENT version dir, so a version's content
    freezes when the NEXT version is created — pin ``v_N`` and you read
    the artifact as of the creation of ``v_{N+1}`` (with a
    compact-per-night cadence, ``latest - 1`` IS last night's state).
    A pinned version that was never committed or was vacuumed raises
    loudly — silently falling back to latest would answer a different
    question than the caller asked."""
    fs, root, jvm = _fs(spark, path)
    committed = [(n, name) for n, name, ok in _version_dirs(fs, root, jvm) if ok]
    if version is not None:
        match = [name for n, name in committed if n == version]
        if not match:
            have = [n for n, _ in committed]
            raise ValueError(
                f"no committed version {version} under {path} "
                f"(committed versions: {have or 'none'}) — it was never "
                "committed, or vacuum reclaimed it")
        return f"{path}/{match[0]}"
    return f"{path}/{committed[-1][1]}" if committed else path


def snapshots(spark: SparkSession, path: str) -> list[dict]:
    """Every version dir under an artifact, ascending: ``{"version",
    "path", "committed"}`` per entry. Committed entries are readable via
    ``resolve(spark, path, version=...)``; uncommitted ones are
    abandoned/in-flight builds awaiting vacuum or commit."""
    fs, root, jvm = _fs(spark, path)
    return [
        {"version": n, "path": f"{path}/{name}", "committed": ok}
        for n, name, ok in _version_dirs(fs, root, jvm)
    ]


def acquire_lease(spark: SparkSession, path: str,
                  ttl_sec: int = DEFAULT_LEASE_TTL_SEC) -> None:
    """Take the artifact's writer lease: create-exclusive
    ``<path>/_LOCK``. Raises :class:`ConcurrentWriterError` when another
    writer holds a non-stale lock; a lock older than ``ttl_sec`` is
    stolen (crashed-writer recovery)."""
    fs, root, jvm = _fs(spark, path)
    lock = jvm.org.apache.hadoop.fs.Path(root, _LOCK)
    for attempt in (0, 1):
        try:
            fs.create(lock, False).close()      # overwrite=False: atomic
            return
        except Exception as e:                  # noqa: BLE001 — py4j wraps the Java type
            if "AlreadyExists" not in str(e) and "already exists" not in str(e):
                raise
        if attempt:
            break
        try:
            age_ms = jvm.java.lang.System.currentTimeMillis() \
                - fs.getFileStatus(lock).getModificationTime()
        except Exception:                       # lock released between create and stat
            continue                            # retry the create once
        if age_ms < ttl_sec * 1000:
            raise ConcurrentWriterError(
                f"writer lease on {path} is held (lock age {age_ms / 1000:.0f}s "
                f"< ttl {ttl_sec}s) — a build/append/compaction of this artifact "
                "is in flight; retry after it commits, or raise ttl_sec only if "
                "you know the holder crashed")
        fs.delete(lock, False)                  # stale: steal and retry once
    raise ConcurrentWriterError(f"writer lease on {path}: lost the steal race")


def release_lease(spark: SparkSession, path: str) -> None:
    """Release the artifact's writer lease (idempotent)."""
    fs, root, jvm = _fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(root, _LOCK), False)


@contextmanager
def writer_lease(spark: SparkSession, path: str,
                 ttl_sec: int = DEFAULT_LEASE_TTL_SEC):
    """Hold the writer lease for a non-versioned mutation (the
    log-structured append family): acquire → body → release, releasing
    on error too — an append crash leaves only a stale lock, never a
    half-visible version."""
    acquire_lease(spark, path, ttl_sec)
    try:
        yield
    finally:
        release_lease(spark, path)


def begin_version(spark: SparkSession, path: str,
                  ttl_sec: int = DEFAULT_LEASE_TTL_SEC) -> str:
    """Start a new (invisible) version: returns ``<path>/v_NNNNNN`` one
    past the highest existing version number, committed or not — an
    abandoned uncommitted build is never reused, only vacuumed. Any
    stale dir at the chosen name is cleared first. Acquires the writer
    lease — released by :func:`commit_version` or
    :func:`abandon_version`; a second concurrent ``begin_version`` on
    the same artifact raises :class:`ConcurrentWriterError`."""
    acquire_lease(spark, path, ttl_sec)
    try:
        fs, root, jvm = _fs(spark, path)
        nums = [n for n, _, _ in _version_dirs(fs, root, jvm)]
        name = f"v_{(max(nums) + 1 if nums else 1):06d}"
        target = jvm.org.apache.hadoop.fs.Path(root, name)
        fs.delete(target, True)
        return f"{path}/{name}"
    except Exception:
        release_lease(spark, path)
        raise


def commit_version(spark: SparkSession, version_dir: str) -> None:
    """Flip the version visible: create its empty ``_COMMITTED`` marker
    (one atomic file create — the whole commit protocol), then release
    the writer lease ``begin_version`` took."""
    fs, vroot, jvm = _fs(spark, version_dir)
    fs.create(jvm.org.apache.hadoop.fs.Path(vroot, _MARKER), True).close()
    release_lease(spark, version_dir.rsplit("/", 1)[0])


def abandon_version(spark: SparkSession, version_dir: str) -> None:
    """Give up an uncommitted build: release the writer lease without
    creating the marker. The dir itself stays invisible (no marker) and
    is reclaimed by the next :func:`vacuum` — same end state as a
    writer crash, but without waiting out the lease TTL."""
    release_lease(spark, version_dir.rsplit("/", 1)[0])


def vacuum(spark: SparkSession, path: str, keep: int = 2) -> list[str]:
    """Delete superseded storage under an artifact ``path``: committed
    versions beyond the newest ``keep`` (default 2 — current plus one
    grace version for probes that resolved just before the last
    commit), every uncommitted version older than the newest committed
    one (abandoned builds), and — once any committed version exists —
    the flat legacy datasets the first versioned build superseded.
    Returns the deleted paths. Never deletes the newest committed
    version; a fresh/flat-only artifact is left untouched."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    fs, root, jvm = _fs(spark, path)
    dirs = _version_dirs(fs, root, jvm)
    committed = [(n, name) for n, name, ok in dirs if ok]
    if not committed:
        return []
    latest_n = committed[-1][0]
    drop = {name for n, name in committed[:-keep]}
    drop |= {name for n, name, ok in dirs if not ok and n < latest_n}
    deleted = []
    for name in sorted(drop):
        fs.delete(jvm.org.apache.hadoop.fs.Path(root, name), True)
        deleted.append(f"{path}/{name}")
    # flat legacy datasets are superseded by any committed version
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and not _VERSION_RE.match(name) and not name.startswith(("_", ".")):
            fs.delete(st.getPath(), True)
            deleted.append(f"{path}/{name}")
    return deleted
