"""Filesystem micro-commit protocol for multi-directory index mutations.

The reference leans on Solr's single-endpoint commit (helper/
SolrSearchIndex.java:538-594): one client.commit() makes a batch of adds/
deletes visible atomically.  Our index is several parquet directories
(doc_stats, doclens_packed, postings, term_stats, tombstones), so a
mutation that touches more than one of them needs its own commit story:

* every mutation runs under a **tag**; ``_txns/<tag>.done`` marks it
  committed and replays become no-ops (idempotent ``foreachBatch`` sinks,
  retried CLI calls);
* all derived data is **staged** under ``_txns/<tag>/<step>/`` first, then
  applied; each apply step is individually idempotent, so a crash at any
  point is healed by re-running the same mutation with the same tag —
  the staging is skipped (``_SUCCESS`` present) and the apply resumes;
* **appends** move staged part files into the live directory under
  deterministic ``<tag>__`` names — a half-finished move resumes without
  duplicating files;
* **swaps** (read-modify-write of term_stats) plant an
  ``_applied_txn_<tag>`` marker *inside* the staged replacement before
  publishing, so a replay can tell "live already contains this txn" from
  "live is still pre-txn" — the double-decrement ADVICE scenario.

**Generation pointers (Iceberg-lite snapshot isolation).**  A "swapped"
table is published as a VERSIONED directory (``term_stats.v<rev>``) and
``current.json`` at the index root names the live version of every table
— rewritten atomically (tmp + rename), so a reader that resolves the
pointer (:func:`table_path`) can never observe a missing or half-renamed
directory, unlike the old in-place rename pair (VERDICT r2 #3/#7).  The
PREVIOUS generation of each table is retained until the next publish
(in-flight readers keep their files — bounded snapshot retention, the
expire-snapshots analog); older generations are GC'd.  ``current.json``
also carries a monotonically increasing ``rev``, bumped by every publish
AND every committed txn (appends too), which is the cheap staleness
signal LocalSearcher checks per query.  A crash between the version
rename and the pointer flip leaves an orphan version dir that the
retried txn adopts (its in-dir marker identifies it) — readers meanwhile
still resolve the old, intact version.

:func:`recover_dir` heals the legacy pre-pointer ``.bak`` rename-pair
layout (indexes written by earlier builds).
"""

from __future__ import annotations

import contextlib as _contextlib
import fcntl as _fcntl
import glob as _glob
import json
import os
import re as _re
import shutil
import threading as _threading

__all__ = [
    "txn_root",
    "txn_done",
    "txn_intent",
    "txn_commit",
    "step_applied",
    "mark_step_applied",
    "staged_path",
    "staging_complete",
    "apply_append",
    "apply_swap",
    "recover_dir",
    "table_path",
    "current_rev",
    "bump_rev",
    "publish_table",
]

CURRENT = "current.json"


def _read_current(index_dir: str) -> dict:
    p = os.path.join(index_dir, CURRENT)
    if not os.path.exists(p):
        return {"rev": 0, "tables": {}, "retained": {}}
    with open(p) as f:
        cur = json.load(f)
    cur.setdefault("tables", {})
    cur.setdefault("retained", {})
    return cur


def _write_current(index_dir: str, cur: dict) -> None:
    p = os.path.join(index_dir, CURRENT)
    tmp = f"{p}.tmp.{os.getpid()}"  # unique per writer — no tmp collisions
    with open(tmp, "w") as f:
        json.dump(cur, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, p)  # atomic pointer flip


# index_dir → [lock file handle, hold depth]: flock is per-open-file-
# description, so a nested acquire through a second fd would self-deadlock;
# the depth counter makes the lock reentrant WITHIN a process.  The whole
# acquire/release path (and the held region) runs under one process-wide
# RLock: flock is per-open-file-description, so WITHOUT it a second thread
# opening its own fd would block on the kernel lock indefinitely while the
# first thread holds it — a hang, not an error (ADVICE r4).  With it,
# same-process concurrent committers serialize cleanly (the held region is
# a milliseconds-scale pointer update), and same-THREAD nesting stays
# reentrant through both layers (RLock + depth counter).
_LOCK_STATE: dict[str, list] = {}
_PROC_LOCK = _threading.RLock()


@_contextlib.contextmanager
def _current_lock(index_dir: str):
    """Serialize committers' read-modify-write of ``current.json`` (ADVICE
    r3: two concurrent committers — e.g. a delete txn and a compact in
    separate processes — could lose a pointer flip or rev bump, and a lost
    flip GCs a generation the live pointer still references).  OS-level
    advisory ``flock`` on a sibling lock file; scope is the pointer update
    only (milliseconds), never the data rewrite, so committers still run
    their heavy work concurrently.  Reentrant within a thread; concurrent
    threads of one process serialize on the process RLock."""
    with _PROC_LOCK:
        key = os.path.abspath(index_dir)
        st = _LOCK_STATE.get(key)
        if st is None:
            f = open(os.path.join(index_dir, CURRENT + ".lock"), "w")
            _fcntl.flock(f, _fcntl.LOCK_EX)
            st = [f, 0]
            _LOCK_STATE[key] = st
        st[1] += 1
        try:
            yield
        finally:
            st[1] -= 1
            if st[1] == 0:
                del _LOCK_STATE[key]
                _fcntl.flock(st[0], _fcntl.LOCK_UN)
                st[0].close()


def table_path(index_dir: str, name: str) -> str:
    """Resolve a logical table (``postings``, ``term_stats``, …) to its
    current versioned directory; falls back to the plain subdir for tables
    never swapped (build output is the implicit generation 0)."""
    rel = _read_current(index_dir)["tables"].get(name)
    return os.path.join(index_dir, rel) if rel else os.path.join(index_dir, name)


def current_rev(index_dir: str) -> int:
    """Monotonic index revision — changes whenever ANY committed mutation
    (publish, append txn, tombstone) lands; the searcher staleness check."""
    return int(_read_current(index_dir).get("rev", 0))


def bump_rev(index_dir: str) -> None:
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        cur["rev"] = int(cur.get("rev", 0)) + 1
        _write_current(index_dir, cur)


def _flip(index_dir: str, name: str, new_dirname: str) -> None:
    """Point ``name`` at ``new_dirname`` (atomic), retain the displaced
    generation for in-flight readers, GC the one retained before it."""
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        displaced = cur["tables"].get(name)
        if displaced is None and os.path.exists(os.path.join(index_dir, name)):
            displaced = name  # build-time plain dir = implicit generation 0
        gc_target = cur["retained"].get(name)
        cur["tables"][name] = new_dirname
        cur["retained"][name] = displaced
        cur["rev"] = int(cur.get("rev", 0)) + 1
        _write_current(index_dir, cur)
        if gc_target and gc_target != new_dirname and gc_target not in pinned_dirs(index_dir):
            # snapshot-referenced generations are pinned (see snapshot())
            shutil.rmtree(os.path.join(index_dir, gc_target), ignore_errors=True)


def publish_table(index_dir: str, name: str, src_dir: str) -> str:
    """Atomically make ``src_dir`` the current generation of ``name``
    (non-txn path — compaction rewrites; idempotent by re-run).  Returns
    the published path.  The version-number allocation, rename and flip
    run under ONE (reentrant) lock hold — a concurrent publisher can
    neither reuse the version number nor interleave its flip."""
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        nxt = os.path.join(index_dir, f"{name}.v{int(cur.get('rev', 0)) + 1}")
        if os.path.exists(nxt):  # orphan of a crashed earlier attempt
            shutil.rmtree(nxt)
        os.rename(src_dir, nxt)
        _flip(index_dir, name, os.path.basename(nxt))
    return nxt


def txn_root(index_dir: str) -> str:
    p = os.path.join(index_dir, "_txns")
    os.makedirs(p, exist_ok=True)
    return p


def txn_done(index_dir: str, tag: str) -> bool:
    return os.path.exists(os.path.join(txn_root(index_dir), f"{tag}.done"))


def txn_intent(index_dir: str, tag: str, payload: dict) -> dict:
    """Record (or reload) the txn's pinned inputs.  The FIRST attempt's
    payload wins: replays reuse it, so values like the id-assignment base
    stay fixed even if live state moved underneath."""
    p = os.path.join(txn_root(index_dir), f"{tag}.intent.json")
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.rename(tmp, p)
    return payload


def txn_commit(index_dir: str, tag: str) -> None:
    root = txn_root(index_dir)
    with open(os.path.join(root, f"{tag}.done"), "w") as f:
        f.write("ok")
    intent = os.path.join(root, f"{tag}.intent.json")
    if os.path.exists(intent):
        os.remove(intent)
    stage = os.path.join(root, tag)
    if os.path.exists(stage):
        shutil.rmtree(stage)
    # appends don't flip a pointer, but they DO change what a query should
    # see — bump the revision so held searchers detect staleness
    bump_rev(index_dir)


def staged_path(index_dir: str, tag: str, step: str) -> str:
    return os.path.join(txn_root(index_dir), tag, step)


def staging_complete(index_dir: str, tag: str, step: str) -> bool:
    return os.path.exists(os.path.join(staged_path(index_dir, tag, step), "_SUCCESS"))


def step_applied(index_dir: str, tag: str, step: str) -> bool:
    return os.path.exists(os.path.join(txn_root(index_dir), tag, f"{step}.applied"))


def mark_step_applied(index_dir: str, tag: str, step: str) -> None:
    d = os.path.join(txn_root(index_dir), tag)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"{step}.applied"), "w") as f:
        f.write("ok")


def _data_files(root: str):
    """(relpath, abspath) for parquet data files, skipping _SUCCESS etc."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn.startswith("_") or fn.startswith("."):
                continue
            ap = os.path.join(dirpath, fn)
            yield os.path.relpath(ap, root), ap


def apply_append(index_dir: str, tag: str, step: str, live_dir: str) -> None:
    """Move staged part files into ``live_dir`` under ``<tag>__`` names
    (subdirectories — e.g. ``bucket=N`` — preserved).  Resumable: already-
    moved files are skipped; files vanish from staging as they move."""
    if step_applied(index_dir, tag, step):
        return
    src = staged_path(index_dir, tag, step)
    os.makedirs(live_dir, exist_ok=True)
    for rel, ap in sorted(_data_files(src)):
        sub, fn = os.path.split(rel)
        dst_dir = os.path.join(live_dir, sub) if sub else live_dir
        os.makedirs(dst_dir, exist_ok=True)
        dst = os.path.join(dst_dir, f"{tag}__{fn}")
        if os.path.exists(dst):
            os.remove(ap)
            continue
        os.rename(ap, dst)
    mark_step_applied(index_dir, tag, step)


def swap_marker(tag: str) -> str:
    return f"_applied_txn_{tag}"


def swap_already_live(live_dir: str, tag: str) -> bool:
    return os.path.exists(os.path.join(live_dir, swap_marker(tag)))


def apply_swap(index_dir: str, tag: str, step: str, live_dir: str | None = None) -> None:
    """Publish the staged directory as the new current generation of table
    ``step`` via the atomic pointer flip (no missing-directory window for
    concurrent readers).  The staged copy carries an in-dir marker, so
    replays detect an already-published generation; a crash between the
    version rename and the pointer flip is healed by adopting the orphan
    (identified by its marker)."""
    if step_applied(index_dir, tag, step):
        return
    cur_path = table_path(index_dir, step)
    recover_dir(cur_path)
    if swap_already_live(cur_path, tag):
        mark_step_applied(index_dir, tag, step)
        return
    # crash window: version dir renamed, pointer not yet flipped → adopt it
    current_rel = os.path.basename(cur_path)
    for p in sorted(_glob.glob(os.path.join(index_dir, f"{step}.v*"))):
        if os.path.basename(p) != current_rel and os.path.exists(os.path.join(p, swap_marker(tag))):
            _flip(index_dir, step, os.path.basename(p))
            mark_step_applied(index_dir, tag, step)
            return
    src = staged_path(index_dir, tag, step)
    with open(os.path.join(src, swap_marker(tag)), "w") as f:
        f.write("ok")
    publish_table(index_dir, step, src)
    mark_step_applied(index_dir, tag, step)


def recover_dir(live_dir: str) -> None:
    """Heal a swap interrupted between its two renames."""
    bak = live_dir + ".bak"
    if not os.path.exists(live_dir) and os.path.exists(bak):
        os.rename(bak, live_dir)
    elif os.path.exists(live_dir) and os.path.exists(bak):
        shutil.rmtree(bak)


# --------------------------------------------------------------- snapshots
# Named snapshots (the Iceberg tag / Solr backup analog).  Pointer-only
# snapshots are NOT enough here: tombstones and postings deltas are
# APPEND-IN-PLACE mutations (the LSM design), so a later delete would
# leak into a "frozen" generation, and meta.json (live avgdl/n_docs)
# rewrites too.  A snapshot therefore records, per table, the resolved
# generation dirname AND the relative FILE MANIFEST inside it (files are
# append-only within a generation — nothing rewrites a data file in
# place), plus byte copies of the small index-root metadata files.
# Creating a snapshot copies only metadata bytes; restore() materializes
# fresh generation dirs by HARDLINKING exactly the manifested files (the
# post-snapshot future stays intact — restore never deletes data) and
# flips every pointer in ONE current.json write.  Snapshot-referenced
# generation dirs are PINNED against _flip/remove_table GC so the links'
# sources survive; vacuum() reclaims after drop_snapshot().

_SNAP_EXCLUDE = {"_txns", "_snapshots"}


def _snap_root(index_dir: str) -> str:
    p = os.path.join(index_dir, "_snapshots")
    os.makedirs(p, exist_ok=True)
    return p


def pinned_dirs(index_dir: str) -> set[str]:
    """Generation dirnames referenced by ANY snapshot — never GC'd."""
    out: set[str] = set()
    for p in _glob.glob(os.path.join(index_dir, "_snapshots", "*.json")):
        try:
            with open(p) as f:
                out.update(json.load(f).get("tables", {}))
        except (OSError, ValueError):
            continue
    return out


def _walk_rel(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            out.append(os.path.relpath(os.path.join(dirpath, fn), root))
    return sorted(out)


def snapshot(index_dir: str, name: str) -> dict:
    """Record the current state under ``name``: per-table generation
    dirname + file manifest, plus copies of the root metadata files
    (meta.json, …).  Atomic (manifest tmp+rename, written LAST);
    re-snapshotting a name overwrites it."""
    if not _re.fullmatch(r"[A-Za-z0-9._-]+", name):
        raise ValueError(f"bad snapshot name {name!r}")
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        resolved = dict(cur["tables"])
        for entry in os.listdir(index_dir):
            full = os.path.join(index_dir, entry)
            if (os.path.isdir(full) and entry not in _SNAP_EXCLUDE
                    and not _re.search(r"\.v\d+$", entry)
                    and not entry.startswith("_")
                    and entry not in resolved):
                resolved[entry] = entry  # implicit generation 0
        tables = {}
        for tname, dirname in resolved.items():
            droot = os.path.join(index_dir, dirname)
            if os.path.isdir(droot):
                tables[tname] = {"dir": dirname, "files": _walk_rel(droot)}
        files_dir = os.path.join(_snap_root(index_dir), f"{name}.files")
        shutil.rmtree(files_dir, ignore_errors=True)
        os.makedirs(files_dir)
        root_files = []
        for entry in os.listdir(index_dir):
            full = os.path.join(index_dir, entry)
            if os.path.isfile(full) and entry not in ("current.json",) \
                    and not entry.endswith(".lock"):
                shutil.copy2(full, os.path.join(files_dir, entry))
                root_files.append(entry)
        # "tables" is the pin set keyed by DIRNAME (pinned_dirs reads the
        # keys); the per-table detail lives in "manifest"
        snap = {"name": name, "rev": int(cur.get("rev", 0)),
                "tables": {m["dir"]: t for t, m in tables.items()},
                "manifest": tables, "root_files": sorted(root_files)}
        dst = os.path.join(_snap_root(index_dir), f"{name}.json")
        tmp = dst + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, dst)
        return snap


def list_snapshots(index_dir: str) -> list[dict]:
    out = []
    for p in sorted(_glob.glob(os.path.join(index_dir, "_snapshots", "*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def restore_snapshot(index_dir: str, name: str) -> None:
    """Materialize the snapshot as FRESH generations (hardlinks of exactly
    the manifested files — post-snapshot data is never deleted), restore
    the root metadata files, and flip every table pointer in ONE atomic
    ``current.json`` write (+ rev bump, so searchers refresh).  Tables
    that did not exist at snapshot time point at a non-existent dirname —
    readers' existence checks see them absent."""
    p = os.path.join(index_dir, "_snapshots", f"{name}.json")
    if not os.path.exists(p):
        raise ValueError(f"no snapshot {name!r}")
    with open(p) as f:
        snap = json.load(f)
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        rev2 = int(cur.get("rev", 0)) + 1
        new_tables: dict[str, str] = {}
        for tname, m in snap["manifest"].items():
            src_root = os.path.join(index_dir, m["dir"])
            missing = [f for f in m["files"]
                       if not os.path.exists(os.path.join(src_root, f))]
            if missing:
                raise ValueError(
                    f"snapshot {name!r}: {tname} lost files {missing[:3]} — "
                    f"was the snapshot's generation vacuumed?")
            dirname = f"{tname}.v{rev2}"
            dst_root = os.path.join(index_dir, dirname)
            shutil.rmtree(dst_root, ignore_errors=True)  # crashed earlier restore
            for rel in m["files"]:
                dst = os.path.join(dst_root, rel)
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                try:
                    os.link(os.path.join(src_root, rel), dst)
                except OSError:
                    shutil.copy2(os.path.join(src_root, rel), dst)
            os.makedirs(dst_root, exist_ok=True)  # empty-table edge
            new_tables[tname] = dirname
        # tables live NOW but absent from the snapshot: point at a
        # never-created dirname so readers see them gone (their data
        # stays on disk for other snapshots / the pre-restore state)
        for tname in set(cur["tables"]):
            if tname not in new_tables:
                new_tables[tname] = f"{tname}.v{rev2}.absent"
        for entry in os.listdir(index_dir):
            if (os.path.isdir(os.path.join(index_dir, entry))
                    and entry not in _SNAP_EXCLUDE and not entry.startswith("_")
                    and not _re.search(r"\.v\d+(\.absent)?$", entry)
                    and entry not in new_tables):
                new_tables[entry] = f"{entry}.v{rev2}.absent"
        files_dir = os.path.join(index_dir, "_snapshots", f"{name}.files")
        for entry in snap.get("root_files", []):
            src = os.path.join(files_dir, entry)
            tmp = os.path.join(index_dir, entry + ".tmp")
            shutil.copy2(src, tmp)
            os.replace(tmp, os.path.join(index_dir, entry))
        cur["tables"] = new_tables
        cur["rev"] = rev2
        _write_current(index_dir, cur)


def drop_snapshot(index_dir: str, name: str) -> None:
    p = os.path.join(index_dir, "_snapshots", f"{name}.json")
    if os.path.exists(p):
        os.remove(p)
    shutil.rmtree(os.path.join(index_dir, "_snapshots", f"{name}.files"),
                  ignore_errors=True)


def remove_table(index_dir: str, name: str) -> None:
    """Drop a logical table: remove its pointer (rev bump) and delete the
    current generation dir UNLESS a snapshot pins it."""
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        resolved = cur["tables"].pop(name, None) or name
        cur.get("retained", {}).pop(name, None)
        cur["rev"] = int(cur.get("rev", 0)) + 1
        _write_current(index_dir, cur)
        if resolved not in pinned_dirs(index_dir):
            shutil.rmtree(os.path.join(index_dir, resolved), ignore_errors=True)


def vacuum(index_dir: str) -> list[str]:
    """Delete VERSIONED generation dirs (``name.vN``) referenced by no
    current pointer, no retained entry and no snapshot — the
    expire-snapshots sweep after :func:`drop_snapshot`.  Returns the
    removed dirnames."""
    with _current_lock(index_dir):
        cur = _read_current(index_dir)
        keep = set(cur["tables"].values()) | set(cur.get("retained", {}).values()) \
            | pinned_dirs(index_dir)
        removed = []
        for entry in os.listdir(index_dir):
            if _re.search(r"\.v\d+$", entry) and entry not in keep \
                    and os.path.isdir(os.path.join(index_dir, entry)):
                shutil.rmtree(os.path.join(index_dir, entry), ignore_errors=True)
                removed.append(entry)
        return removed
