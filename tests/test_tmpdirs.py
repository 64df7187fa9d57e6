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
