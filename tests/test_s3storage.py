"""S3 lake storage (sources/s3storage.py) against moto's in-process S3:
the commit protocol's full byte-level surface — conditional-PUT
exclusivity, log listing, checkpoints (parquet format in the bucket),
snapshot/time-travel resolution, history, vacuum inventory — plus the
Spark WRITE path (create/append stage locally, publish uploads).

Spark-side READS (read_snapshot, merge's rewrite, prune_files'
distributed scan) need an s3a-configured cluster session and are out of
scope here by design — resolve_read_path's URI mapping is asserted
instead (the seam contract the cluster path consumes)."""

from __future__ import annotations

import json
import os

import pytest

boto3 = pytest.importorskip("boto3")
moto = pytest.importorskip("moto")

from zio_analytics_spark.sources import laketable as lake  # noqa: E402
from zio_analytics_spark.sources.s3storage import S3Storage  # noqa: E402

BUCKET = "lake-test-bucket"


@pytest.fixture()
def s3store():
    with moto.mock_aws():
        client = boto3.client("s3", region_name="us-east-1")
        client.create_bucket(Bucket=BUCKET)
        storage = S3Storage(BUCKET, prefix="warehouse", client=client)
        prev = lake.set_storage(storage)
        try:
            yield storage
        finally:
            lake.set_storage(prev)


def _add(path, lo, hi):
    return {"add": {"path": path, "rows": hi - lo + 1,
                    "stats": {"k": {"min": lo, "max": hi}}}}


def _meta():
    return {"meta": {"key_cols": ["k"],
                     "schema": {"k": "bigint", "v": "double"},
                     "partition_by": []}}


def test_put_if_absent_exclusive_full_content(s3store):
    p = "/tables/t/_log/x.json"
    assert s3store.put_if_absent(p, b"winner") is True
    assert s3store.put_if_absent(p, b"loser") is False
    assert s3store.read_bytes(p) == b"winner"
    # put_atomic overwrites; read_bytes raises OSError-family on absent
    s3store.put_atomic(p, b"v2")
    assert s3store.read_bytes(p) == b"v2"
    with pytest.raises(FileNotFoundError):
        s3store.read_bytes("/tables/t/_log/absent.json")
    with pytest.raises(FileNotFoundError):
        s3store.list_names("/tables/absent/_log")


def test_commit_protocol_end_to_end_on_s3(s3store):
    """The whole log lifecycle through the seam: commits, conflict
    signal, checkpoint at v10 (parquet bytes in the bucket), snapshot
    resolution from checkpoint + tail, time travel, history."""
    t = "/tables/orders"
    lake._commit(t, 0, [_meta(), _add("part-0.parquet", 0, 99)], "CREATE")
    for v in range(1, 13):
        lake._commit(
            t, v, [_add(f"part-{v}.parquet", v * 100, v * 100 + 99)], "APPEND"
        )
    with pytest.raises(lake.ConcurrentCommitError):
        lake._commit(t, 12, [], "APPEND")
    # parquet checkpoint landed in the bucket at v10
    names = s3store.list_names(f"{t}/_log")
    assert f"{10:020d}.checkpoint.parquet" in names
    snap = lake.snapshot(t)
    assert snap.version == 12 and len(snap.files) == 13
    assert snap.key_cols == ["k"]
    assert len(lake.snapshot(t, 5).files) == 6  # time travel
    hist = lake.table_history(t)
    assert [h["version"] for h in hist] == list(range(13))
    # meta-only resolution never parses checkpoint file rows
    meta_only = lake.snapshot(t, with_files=False)
    assert meta_only.files is None and meta_only.schema["k"] == "bigint"
    # driver-fallback pruning (no Spark session involved on S3)
    # exercised via the checkpoint-less prefix: version 5 < checkpoint
    snap5 = lake.snapshot(t, 5)
    touched = [
        p for p, a in snap5.files.items()
        if not lake._stats_disjoint(a["stats"]["k"], 150, 260)
    ]
    assert sorted(touched) == ["part-1.parquet", "part-2.parquet"]


def test_vacuum_inventory_on_s3(s3store):
    """vacuum's candidate inventory, age guard, and deletes all route
    through boto3: an object dereferenced by every retained snapshot is
    removed from the bucket; referenced ones survive."""
    t = "/tables/v"
    lake._commit(t, 0, [_meta(), _add("part-a.parquet", 0, 9)], "CREATE")
    lake._commit(
        t, 1,
        [{"remove": {"path": "part-a.parquet"}}, _add("part-b.parquet", 0, 9)],
        "OVERWRITE",
    )
    s3store.put_atomic(f"{t}/part-a.parquet", b"old bytes")
    s3store.put_atomic(f"{t}/part-b.parquet", b"live bytes")
    # young objects are protected by the age guard
    assert lake.vacuum(t, keep_versions=1, min_age_seconds=3600) == []
    doomed = lake.vacuum(t, keep_versions=1, min_age_seconds=0)
    assert doomed == ["part-a.parquet"]
    assert s3store.read_bytes(f"{t}/part-b.parquet") == b"live bytes"
    with pytest.raises(FileNotFoundError):
        s3store.read_bytes(f"{t}/part-a.parquet")


def test_spark_write_path_publishes_to_bucket(s3store, spark, tmp_path):
    """create_table + append with S3 storage: Spark stages parquet
    locally, per-file key stats are computed from the STAGED files
    (publish discards the local copy), publish_file uploads, and the
    log references bucket objects only."""
    t = str(tmp_path / "t")
    df = spark.range(100).selectExpr("id AS k", "id * 1.0 AS v")
    lake.create_table(df.repartition(2), t, key_cols=["k"])
    lake.append(spark.range(100, 150).selectExpr("id AS k", "id * 1.0 AS v"), t)
    snap = lake.snapshot(t)
    assert snap.version == 1 and len(snap.files) >= 3
    for rel, a in snap.files.items():
        # stats survived the staged-then-uploaded flow
        assert a["stats"]["k"]["min"] >= 0
        # object exists in the bucket; local copy is gone
        assert len(s3store.read_bytes(os.path.join(t, rel))) > 0
        assert not os.path.exists(os.path.join(t, rel))
    ks = {a["stats"]["k"]["min"] for a in snap.files.values()}
    assert min(ks) == 0
    # the read URI is the cluster-side mapping
    some_rel = next(iter(snap.files))
    uri = s3store.resolve_read_path(t, some_rel)
    assert uri.startswith(f"s3a://{BUCKET}/warehouse/") and uri.endswith(
        some_rel.replace(os.sep, "/")
    )


def test_checkpoint_roundtrip_via_bucket_bytes(s3store):
    """_load_checkpoint reads the parquet checkpoint straight from
    bucket bytes (BufferReader — no filesystem), both with and without
    file rows."""
    t = "/tables/cp"
    lake._commit(t, 0, [_meta()] + [
        _add(f"part-{i}.parquet", i * 10, i * 10 + 9) for i in range(25)
    ], "CREATE")
    for v in range(1, 11):
        lake._commit(t, v, [_add(f"extra-{v}.parquet", 0, 1)], "APPEND")
    state = lake._load_checkpoint(t, 10)
    assert len(state["files"]) == 35
    assert lake._load_checkpoint(t, 10, with_files=False)["files"] == []
    # history resolves from checkpoint + empty tail
    assert lake.snapshot(t, 10).version == 10


def test_delete_dir_and_json_roundtrip(s3store):
    s3store.put_atomic("/d/x/a.txt", b"1")
    s3store.put_atomic("/d/x/sub/b.txt", b"2")
    s3store.put_atomic("/d/keep.txt", b"3")
    s3store.delete_dir("/d/x")
    assert s3store.list_names("/d") == ["keep.txt"]
    payload = json.dumps({"k": 1}).encode()
    s3store.put_atomic("/d/j.json", payload)
    assert json.loads(s3store.read_bytes("/d/j.json")) == {"k": 1}


def test_put_if_absent_retries_conditional_request_conflict(s3store):
    """Round-15 ADVICE: real S3's documented error code for a concurrent
    If-None-Match PUT conflict is ConditionalRequestConflict (moto uses
    other 409 codes) — a transient conflict must RETRY, not raise out of
    the commit path."""
    from botocore.exceptions import ClientError

    calls = {"conflicts": 0}
    orig = s3store.client.put_object

    def flaky(**kw):
        if "IfNoneMatch" in kw and calls["conflicts"] == 0:
            calls["conflicts"] += 1
            raise ClientError(
                {
                    "Error": {
                        "Code": "ConditionalRequestConflict",
                        "Message": "A conflicting conditional operation "
                        "is currently in progress against this resource.",
                    }
                },
                "PutObject",
            )
        return orig(**kw)

    s3store.client.put_object = flaky
    p = "/tables/t/_log/00000000000000000000.json"
    assert s3store.put_if_absent(p, b"winner") is True
    assert calls["conflicts"] == 1
    assert s3store.read_bytes(p) == b"winner"
    # a non-retryable code still raises out
    def hard_fail(**kw):
        raise ClientError(
            {"Error": {"Code": "AccessDenied", "Message": "no"}}, "PutObject"
        )

    s3store.client.put_object = hard_fail
    with pytest.raises(ClientError):
        s3store.put_if_absent("/tables/t/_log/other.json", b"x")
