"""Crash-consistent table commits for local-FS parquet tables.

The reference's contract is a *daily production refresh*
(BikesDWSQl.sql:4) — a mid-run crash must never leave the warehouse
unreadable. The old staged-write swap here (rmtree old, rename staged)
had a window where the live directory was simply gone. This module
replaces it with a manifest-pointer commit expressed with POSIX rename
atomicity:

Layout — a committed table ``<path>`` is a SYMLINK to an immutable
snapshot directory ``<path>__snap-<n>``; ``<path>__CURRENT`` is a
manifest file naming the live snapshot. Commit protocol::

    1. write the new snapshot dir <path>__snap-<n+1>
         crash -> live table untouched, orphan dir GC'd later
    2. os.replace() the manifest tmp over <path>__CURRENT
         atomic single-file rename: THE commit point
    3. os.replace() a tmp symlink over <path>
         atomic: readers flip old->new in one syscall
    4. rmtree the superseded snapshot dir
         crash -> orphan dir; repair_table()/next commit GC it

A reader at any instant resolves the symlink to one complete snapshot
— there is NO window where ``<path>`` is missing or half-written for a
table born under this layout. After a crash between 2 and 3 the
symlink lags the manifest; ``repair_table()`` (also run automatically
at the start of every commit) re-points it and removes orphans.
Readers need no code changes: ``spark.read.parquet(path)`` follows the
symlink transparently.

Legacy plain-directory tables are migrated on their first commit via
``migrate in commit_snapshot``: the manifest records intent BEFORE the
directory is renamed aside, so the one sub-millisecond window (between
rename-aside and symlink creation, only ever paid once per table) is
closed by ``repair_table()``.

On a real cluster/object store this module is the seam you replace
with Delta/Iceberg transactional commits — same manifest-pointer idea,
same plans. Tests: tests/test_snapshot_swap.py fault-injects a crash
at every step and proves the table stays readable and a re-run
converges.
"""

from __future__ import annotations

import os
import re
import shutil

_SNAP_RE = re.compile(r"__snap-(\d+)$")

# Indirection for the physical FS steps so tests can fault-inject a
# crash between any two of them (tests/test_snapshot_swap.py).
_fs_replace = os.replace
_fs_symlink = os.symlink
_fs_rmtree = shutil.rmtree
_fs_rename = os.rename


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "__CURRENT"


def read_manifest(path: str) -> str | None:
    """Basename of the committed snapshot dir, or None."""
    try:
        with open(_manifest_path(path), encoding="utf-8") as f:
            name = f.read().strip()
        return name or None
    except FileNotFoundError:
        return None


def list_snapshots(path: str) -> list[str]:
    """All on-disk snapshot dirs for ``path`` (abs), ascending by id."""
    path = path.rstrip("/")
    parent = os.path.dirname(path) or "."
    stem = os.path.basename(path)
    out = []
    try:
        names = os.listdir(parent)
    except FileNotFoundError:
        return []
    for name in names:
        if not name.startswith(stem + "__snap-"):
            continue
        m = _SNAP_RE.search(name)
        full = os.path.join(parent, name)
        if m and os.path.isdir(full) and not os.path.islink(full):
            out.append((int(m.group(1)), full))
    return [p for _, p in sorted(out)]


def next_snapshot_path(path: str) -> str:
    """A fresh snapshot dir name (does not create it). Strictly above
    every on-disk snapshot id AND the manifest's id, so a replayed
    commit after a crash never reuses a possibly-half-written dir."""
    path = path.rstrip("/")
    top = 0
    for snap in list_snapshots(path):
        m = _SNAP_RE.search(snap)
        top = max(top, int(m.group(1)))
    cur = read_manifest(path)
    if cur:
        m = _SNAP_RE.search(cur)
        if m:
            top = max(top, int(m.group(1)))
    return f"{path}__snap-{top + 1}"


def _point_symlink(path: str, snap_basename: str) -> None:
    """Atomically (re)target ``path`` -> snapshot dir (relative link,
    so the warehouse tree stays relocatable)."""
    tmp = path + "__lnk.tmp"
    if os.path.lexists(tmp):
        os.remove(tmp)
    _fs_symlink(snap_basename, tmp)
    _fs_replace(tmp, path)


def _gc(path: str, keep_basenames) -> None:
    keep = set(keep_basenames)
    for snap in list_snapshots(path):
        if os.path.basename(snap) not in keep:
            _fs_rmtree(snap, ignore_errors=True)


def commit_snapshot(path: str, staged: str) -> None:
    """Commit a fully-written snapshot dir ``staged`` as the new live
    state of table ``path``. Crash-safe at every step (see module
    docstring); call ``repair_table(path)`` after a crash (commit also
    self-repairs on entry)."""
    path = path.rstrip("/")
    snap_name = os.path.basename(staged)
    # converge any prior half-commit first — but never GC the incoming
    # snapshot we are about to commit
    repair_table(path, keep=(snap_name,))

    legacy = os.path.isdir(path) and not os.path.islink(path)

    # step 2 — manifest commit point
    mtmp = _manifest_path(path) + ".tmp"
    with open(mtmp, "w", encoding="utf-8") as f:
        f.write(snap_name + "\n")
        f.flush()
        os.fsync(f.fileno())
    _fs_replace(mtmp, _manifest_path(path))

    if legacy:
        # migrate: move the plain dir aside (it becomes snap-0 so the
        # GC protocol owns it), then install the symlink. The manifest
        # above already names the NEW snapshot, so a crash in this
        # window is repaired forward to the new state.
        aside = f"{path}__snap-0"
        if not os.path.isdir(aside):
            _fs_rename(path, aside)

    # step 3 — atomic reader flip
    _point_symlink(path, snap_name)
    # step 4 — GC superseded snapshots
    _gc(path, (snap_name,))


def current_snapshot(path: str) -> str | None:
    """Absolute path of the live snapshot dir, or the path itself for
    a legacy plain dir, or None if the table does not exist."""
    path = path.rstrip("/")
    if os.path.islink(path):
        target = os.path.join(os.path.dirname(path), os.readlink(path))
        return target if os.path.isdir(target) else None
    if os.path.isdir(path):
        return path
    return None


def repair_table(path: str, keep=()) -> str | None:
    """Reconcile a table after a crash: make the symlink agree with
    the manifest (manifest wins — it is the commit record), finish a
    half-done legacy migration, and GC orphan snapshot dirs (except
    any in ``keep`` — an in-flight staged snapshot). Returns the live
    snapshot dir (absolute) or None if no table exists. Idempotent;
    safe to call on a healthy table."""
    path = path.rstrip("/")
    cur = read_manifest(path)
    snaps = list_snapshots(path)

    if cur is None:
        # never committed through this module: legacy dir or nothing
        if os.path.isdir(path) and not os.path.islink(path):
            return path
        if os.path.islink(path) and snaps:
            # orphan symlink without manifest: trust the newest snap
            _point_symlink(path, os.path.basename(snaps[-1]))
            _gc(path, {os.path.basename(snaps[-1]), *keep})
            return snaps[-1]
        return None

    cur_abs = os.path.join(os.path.dirname(path) or ".", cur)
    if not os.path.isdir(cur_abs):
        # crashed between snapshot write and nothing else: manifest
        # points at a dir that never finished — fall back to the
        # newest complete snapshot (or legacy dir still in place).
        if os.path.isdir(path) and not os.path.islink(path):
            return path
        if snaps:
            _point_symlink(path, os.path.basename(snaps[-1]))
            return snaps[-1]
        return None

    if os.path.isdir(path) and not os.path.islink(path):
        # half-migrated legacy table: manifest committed, dir not yet
        # moved aside. Finish: move aside, flip, GC.
        if os.path.realpath(path) != os.path.realpath(cur_abs):
            aside = f"{path}__snap-0"
            if not os.path.isdir(aside):
                _fs_rename(path, aside)
    if not (os.path.islink(path) and os.readlink(path) == cur):
        _point_symlink(path, cur)
    _gc(path, {cur, *keep})
    return cur_abs
