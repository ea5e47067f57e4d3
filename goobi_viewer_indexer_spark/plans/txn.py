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
        if gc_target and gc_target != new_dirname:
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
