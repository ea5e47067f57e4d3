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
  ``_applied_txn_<tag>`` marker *inside* the staged replacement before the
  rename pair, so a replay can tell "live already contains this txn" from
  "live is still pre-txn" — the double-decrement ADVICE scenario.

Recovery from a crash *between* the two renames of a swap is
:func:`recover_dir`: live missing + ``.bak`` present → roll back to the
pre-swap state (the staged replacement is still intact and the swap is
simply retried).

This is Lucene-style commit-point atomicity (readers that re-open between
steps of an uncommitted txn can see a torn state; a crashed txn heals on
the next maintenance call) — the Iceberg-snapshot upgrade is the named
deviation in SURVEY §1.3.
"""

from __future__ import annotations

import json
import os
import shutil

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
]


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


def apply_swap(index_dir: str, tag: str, step: str, live_dir: str) -> None:
    """Replace ``live_dir`` with the staged directory.  The staged copy
    carries an in-dir marker, so replays detect an already-swapped live."""
    if step_applied(index_dir, tag, step):
        return
    recover_dir(live_dir)
    if swap_already_live(live_dir, tag):
        mark_step_applied(index_dir, tag, step)
        return
    src = staged_path(index_dir, tag, step)
    with open(os.path.join(src, swap_marker(tag)), "w") as f:
        f.write("ok")
    bak = live_dir + ".bak"
    if os.path.exists(bak):
        shutil.rmtree(bak)
    if os.path.exists(live_dir):
        os.rename(live_dir, bak)
        os.rename(src, live_dir)
        shutil.rmtree(bak)
    else:  # first-time creation of the side table
        os.rename(src, live_dir)
    mark_step_applied(index_dir, tag, step)


def recover_dir(live_dir: str) -> None:
    """Heal a swap interrupted between its two renames."""
    bak = live_dir + ".bak"
    if not os.path.exists(live_dir) and os.path.exists(bak):
        os.rename(bak, live_dir)
    elif os.path.exists(live_dir) and os.path.exists(bak):
        shutil.rmtree(bak)
