"""Session-scoped scratch-directory registry with crash-robust sweeping.

Several operators MATERIALIZE an intermediate to parquet and return a lazy
scan of it (dedup shingle tables, ANN index layouts, streaming source/
checkpoint dirs). Those directories cannot be removed inside the operator —
the returned DataFrame still reads them — so without a lifecycle they
accumulate for the life of the machine (the round-4 hygiene finding:
dozens of orphaned ``zas_*`` dirs per sweep).

Contract:

- :func:`scratch_dir` replaces ``tempfile.mkdtemp`` for any directory whose
  lifetime must outlive the creating function. Every scratch dir is created
  under ONE per-process parent ``$TMPDIR/zas_p<pid>/`` and registered here.
- :func:`cleanup` removes every registered directory AND the per-process
  parent. It runs automatically at interpreter exit (``atexit``) and when a
  session built by ``session.get_spark`` is ``stop()``-ed.
- :func:`sweep_stale` is the crash-robust tier: ``atexit`` cannot run when
  the process is SIGKILLed, so each new session start scans the temp root
  for ``zas_p<pid>`` parents whose pid is no longer alive and removes them
  wholesale. Flat legacy ``zas_*`` dirs (pre-parent layout) are swept once
  they are older than an hour — the age guard avoids racing a concurrently
  running process built from older code.

On a real cluster the same intermediates live in object storage under a
job-scoped prefix and the orchestrator owns retention — this registry is
the local-mode equivalent of that retention contract, and ``sweep_stale``
is the equivalent of an orphaned-prefix janitor keyed on job liveness.
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile
import threading
import time

__all__ = [
    "scratch_dir",
    "cleanup",
    "registered",
    "sweep_stale",
    "process_parent",
    "materialize_table",
]

_dirs: set[str] = set()
_lock = threading.Lock()
_parent: str | None = None

_PARENT_RE = re.compile(r"zas_p(\d+)$")
_LEGACY_MAX_AGE_SEC = 3600.0


def process_parent() -> str:
    """The per-process scratch parent ``$TMPDIR/zas_p<pid>``, created lazily.

    Nesting every scratch dir under one pid-named parent is what makes
    cleanup survive SIGKILL: a later process can tell from the name alone
    whether the owner is still alive and remove the whole tree if not.
    """
    global _parent
    with _lock:
        if _parent is None or not os.path.isdir(_parent):
            path = os.path.join(tempfile.gettempdir(), f"zas_p{os.getpid()}")
            os.makedirs(path, exist_ok=True)
            _parent = path
        return _parent


def scratch_dir(prefix: str = "zas_") -> str:
    """``tempfile.mkdtemp`` under :func:`process_parent` + registration."""
    path = tempfile.mkdtemp(prefix=prefix, dir=process_parent())
    with _lock:
        _dirs.add(path)
    return path


def registered() -> list[str]:
    """Snapshot of currently registered (not yet cleaned) directories."""
    with _lock:
        return sorted(_dirs)


def cleanup() -> int:
    """Remove every registered scratch directory and the per-process parent;
    returns how many registered dirs existed.

    Safe to call repeatedly; a DataFrame still backed by one of these dirs
    must not be used afterwards (same contract as dropping a cache). A later
    :func:`scratch_dir` call recreates the parent, so ``spark.stop()`` +
    new session in one process works.
    """
    global _parent
    with _lock:
        doomed = list(_dirs)
        _dirs.clear()
        parent, _parent = _parent, None
    n = 0
    for path in doomed:
        try:
            shutil.rmtree(path)
            n += 1
        except FileNotFoundError:
            pass
        except OSError:
            shutil.rmtree(path, ignore_errors=True)
    if parent is not None:
        # Catches stage dirs etc. created BESIDE a registered dir (same
        # parent) without their own registration.
        shutil.rmtree(parent, ignore_errors=True)
    return n


def materialize_table(df, prefix: str = "zas_tbl_"):
    """Write an intermediate DataFrame to a scratch parquet and return a
    lazy scan of it.

    This is the repo-wide replacement for ``persist()`` on shared
    intermediates (dedup shingle tables, BPE vocab segmentations): a cache
    must be released by *someone* after an action the operator never sees,
    whereas a materialized table needs no release protocol — no executor
    memory held, each consumer re-scans columnar data, and the directory's
    lifetime is owned by this registry (removed at session stop /
    interpreter exit / dead-pid sweep). The write is one eager job.
    """
    path = scratch_dir(prefix=prefix)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.schema(df.schema).parquet(path)


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def sweep_stale(root: str | None = None) -> int:
    """Remove scratch parents of dead processes (and aged-out legacy flat
    dirs) from the temp root; returns how many directories were removed.

    Called from ``session.get_spark`` so every new session heals whatever a
    SIGKILLed predecessor left behind — the tier ``atexit`` cannot provide.
    """
    root = root or tempfile.gettempdir()
    me = os.getpid()
    now = time.time()
    removed = 0
    try:
        names = os.listdir(root)
    except OSError:
        return 0
    for name in names:
        if not name.startswith("zas_"):
            continue
        full = os.path.join(root, name)
        if not os.path.isdir(full) or os.path.islink(full):
            continue
        m = _PARENT_RE.match(name)
        if m:
            pid = int(m.group(1))
            if pid == me or _pid_alive(pid):
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed += 1
        else:
            # Legacy flat layout (pre round-6): no owner encoded in the name,
            # so only sweep once old enough that no live run can be using it.
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age > _LEGACY_MAX_AGE_SEC:
                shutil.rmtree(full, ignore_errors=True)
                removed += 1
    return removed


atexit.register(cleanup)
