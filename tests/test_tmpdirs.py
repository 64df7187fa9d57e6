"""Scratch-dir lifecycle: materialized intermediates (dedup shingle tables,
ANN layouts) are registered in zio_analytics_spark.tmpdirs and removed at
session stop / cleanup() — the round-4 hygiene finding (orphaned zas_* dirs
accumulating for the life of the machine)."""

from __future__ import annotations

import os

from zio_analytics_spark import tmpdirs
from zio_analytics_spark.operators import dedup


def test_scratch_dir_registers_and_cleanup_removes():
    before = set(tmpdirs.registered())
    d = tmpdirs.scratch_dir(prefix="zas_test_")
    assert os.path.isdir(d)
    assert d in tmpdirs.registered()
    n = tmpdirs.cleanup()
    assert n >= 1
    assert not os.path.exists(d)
    assert tmpdirs.registered() == []
    # idempotent; dirs already gone are not an error
    assert tmpdirs.cleanup() == 0
    del before


def test_dedup_entry_leaves_no_scratch_dirs_after_cleanup(spark):
    """Run a materializing dedup operator end-to-end, then cleanup(): every
    zas_dedup_* dir it created must be gone from the temp root."""
    tmpdirs.cleanup()  # isolate from other tests
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta doc{i % 5} eta") for i in range(30)],
        "doc_id long, text string",
    )
    out = dedup.jaccard_pairs(docs, threshold=0.3)
    out.count()  # consume — the shingle table was materialized on disk
    created = tmpdirs.registered()
    assert created, "expected the dedup operator to register its scratch dir"
    assert all(os.path.isdir(p) for p in created)
    tmpdirs.cleanup()
    assert all(not os.path.exists(p) for p in created)
    assert tmpdirs.registered() == []


def test_scratch_dirs_nest_under_per_process_parent():
    """Round-6 crash-robust layout: every scratch dir lives under ONE
    pid-named parent so a later process can identify and sweep orphans."""
    d = tmpdirs.scratch_dir(prefix="zas_test_")
    parent = tmpdirs.process_parent()
    assert os.path.dirname(d) == parent
    assert os.path.basename(parent) == f"zas_p{os.getpid()}"
    tmpdirs.cleanup()
    assert not os.path.exists(parent)
    # a later scratch_dir recreates the parent (stop() + new session works)
    d2 = tmpdirs.scratch_dir(prefix="zas_test_")
    assert os.path.isdir(d2)
    tmpdirs.cleanup()


def test_cleanup_removes_unregistered_siblings_inside_parent():
    """Stage/side dirs created beside a registered dir (e.g. foreachBatch's
    overwrite staging) are caught by the parent-level rmtree."""
    d = tmpdirs.scratch_dir(prefix="zas_test_")
    stage = d + "_stage0"
    os.makedirs(stage)
    parent = tmpdirs.process_parent()
    tmpdirs.cleanup()
    assert not os.path.exists(stage)
    assert not os.path.exists(parent)


def test_sweep_stale_removes_dead_pid_parents_and_aged_legacy(tmp_path):
    """SIGKILL tier: a zas_p<dead-pid> parent is swept; a live-pid parent
    (ours) survives; a flat legacy zas_* dir is swept only once old."""
    import time

    root = str(tmp_path)
    dead = os.path.join(root, "zas_p999999999")  # pid far above pid_max
    os.makedirs(os.path.join(dead, "zas_inner_x"))
    mine = os.path.join(root, f"zas_p{os.getpid()}")
    os.makedirs(mine)
    fresh_legacy = os.path.join(root, "zas_fresh_legacy")
    os.makedirs(fresh_legacy)
    old_legacy = os.path.join(root, "zas_old_legacy")
    os.makedirs(old_legacy)
    stale = time.time() - 7200
    os.utime(old_legacy, (stale, stale))
    unrelated = os.path.join(root, "keepme")
    os.makedirs(unrelated)

    removed = tmpdirs.sweep_stale(root)
    assert removed == 2
    assert not os.path.exists(dead)
    assert not os.path.exists(old_legacy)
    assert os.path.isdir(mine)
    assert os.path.isdir(fresh_legacy)
    assert os.path.isdir(unrelated)


def test_sweep_stale_after_simulated_sigkill():
    """End-to-end crash scenario: a child process creates scratch dirs and is
    SIGKILLed mid-run (atexit cannot fire); the next sweep_stale() — what a
    new get_spark() runs — removes its whole parent tree."""
    import signal
    import subprocess
    import sys
    import tempfile

    code = (
        "import sys, time; sys.path.insert(0, %r); "
        "from zio_analytics_spark import tmpdirs; "
        "print(tmpdirs.scratch_dir(prefix='zas_killme_'), flush=True); "
        "time.sleep(60)" % os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", code], stdout=subprocess.PIPE, text=True
    )
    child_dir = proc.stdout.readline().strip()
    assert os.path.isdir(child_dir)
    parent = os.path.dirname(child_dir)
    assert os.path.basename(parent) == f"zas_p{proc.pid}"
    proc.kill()  # SIGKILL: no atexit
    proc.wait()
    tmpdirs.sweep_stale(tempfile.gettempdir())
    assert not os.path.exists(parent)


def test_session_stop_hook_wraps_stop():
    """get_spark wraps spark.stop to run tmpdirs.cleanup() first (verified
    without actually stopping the shared test session)."""
    from zio_analytics_spark.session import _hook_scratch_cleanup

    class FakeSpark:
        stopped = False

        def stop(self):
            self.stopped = True

    fake = FakeSpark()
    _hook_scratch_cleanup(fake)
    d = tmpdirs.scratch_dir(prefix="zas_hooktest_")
    fake.stop()
    assert fake.stopped
    assert not os.path.exists(d)
    # idempotent re-hook does not double-wrap
    first = fake.stop
    _hook_scratch_cleanup(fake)
    assert fake.stop is first
