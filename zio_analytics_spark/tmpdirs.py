"""Session-scoped scratch-directory registry.

Several operators MATERIALIZE an intermediate to parquet and return a lazy
scan of it (dedup shingle tables, ANN index layouts, streaming source/
checkpoint dirs). Those directories cannot be removed inside the operator —
the returned DataFrame still reads them — so without a lifecycle they
accumulate for the life of the machine (the round-4 hygiene finding:
dozens of orphaned ``zas_*`` dirs per sweep).

Contract:

- :func:`scratch_dir` replaces ``tempfile.mkdtemp`` for any directory whose
  lifetime must outlive the creating function: the path is registered here.
- :func:`cleanup` removes every registered directory. It runs automatically
  at interpreter exit (``atexit``) and when a session built by
  ``session.get_spark`` is ``stop()``-ed; callers with long-lived processes
  can invoke it explicitly once no returned DataFrame is needed anymore.
- Directories a caller removes itself (try/finally ``rmtree``) simply
  vanish early; ``cleanup`` ignores already-missing paths.

On a real cluster the same intermediates live in object storage under a
job-scoped prefix and the orchestrator owns retention — this registry is
the local-mode equivalent of that retention contract.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import threading

__all__ = ["scratch_dir", "cleanup", "registered"]

_dirs: set[str] = set()
_lock = threading.Lock()


def scratch_dir(prefix: str = "zas_") -> str:
    """``tempfile.mkdtemp`` + registration for end-of-session removal."""
    path = tempfile.mkdtemp(prefix=prefix)
    with _lock:
        _dirs.add(path)
    return path


def registered() -> list[str]:
    """Snapshot of currently registered (not yet cleaned) directories."""
    with _lock:
        return sorted(_dirs)


def cleanup() -> int:
    """Remove every registered scratch directory; returns how many existed.

    Safe to call repeatedly; a DataFrame still backed by one of these dirs
    must not be used afterwards (same contract as dropping a cache).
    """
    with _lock:
        doomed = list(_dirs)
        _dirs.clear()
    n = 0
    for path in doomed:
        try:
            shutil.rmtree(path)
            n += 1
        except FileNotFoundError:
            pass
        except OSError:
            shutil.rmtree(path, ignore_errors=True)
    return n


atexit.register(cleanup)
