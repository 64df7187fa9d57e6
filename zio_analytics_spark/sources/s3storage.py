"""[EXT] S3 object-store backend for the lake table's storage seam
(round-14 verdict #6 — the seam and its contract landed in round 14;
this is the real implementation over boto3).

Maps the protocol's filesystem-style paths to object keys:
``S3Storage(bucket, prefix)`` stores path ``P`` at key
``prefix + P.lstrip('/')`` — the table identity string stays a local-
looking path (Spark stages its parquet parts there before
``publish_file`` uploads them), while every PROTOCOL artifact (log
entries, checkpoints, data files) lives only in the bucket.

Contract mapping (module docstring of laketable spells out the seam):

* ``put_if_absent``  → ``PutObject`` with ``If-None-Match: *`` — S3's
  conditional write (GA since 2024) makes the full-body create atomic
  and exclusive; the 412 ``PreconditionFailed`` IS the optimistic-
  concurrency loss signal. This is the only primitive commit
  correctness rests on, and it needs no lock service.
* ``put_atomic``     → plain ``PutObject`` (any object PUT is never
  observable half-written).
* ``publish_file``   → ``upload_file`` then drop the local staged copy
  (objects need no rename; the log entry alone makes them visible).
* ``resolve_read_path`` → ``s3a://bucket/key`` (configurable scheme) —
  what a cluster-side Spark opens. A LOCAL test session has no s3a
  connector, so Spark-side reads (read_snapshot, merge's rewrite,
  prune_files' distributed checkpoint scan) need a real cluster or an
  s3a-configured session; the PROTOCOL surface (commits, snapshots,
  checkpoints, history, vacuum) is pure boto3 bytes and is what
  tests/test_s3storage.py proves against moto.
* ``newest_mtime`` inherits the flat-object default (``mtime``):
  staging trees are local-only scratch — they never exist in the
  bucket, so vacuum's staging sweep is a no-op here by construction.

boto3 is optional at import time (the module loads without it; the
constructor raises), so environments without it keep the local-FS
default untouched.
"""

from __future__ import annotations

import os

from zio_analytics_spark.sources.laketable import LakeStorage

try:  # optional dependency — probe, never a hard import
    import boto3
    from botocore.exceptions import ClientError
except ImportError:  # pragma: no cover - exercised via constructor guard
    boto3 = None
    ClientError = Exception

__all__ = ["S3Storage"]

_MISSING_CODES = {"NoSuchKey", "404", "NotFound"}


class S3Storage(LakeStorage):
    def __init__(
        self,
        bucket: str,
        prefix: str = "",
        client=None,
        read_scheme: str = "s3a",
    ) -> None:
        if boto3 is None and client is None:
            raise ImportError(
                "S3Storage needs boto3 (pip install boto3) or an injected "
                "client"
            )
        self.bucket = bucket
        self.prefix = prefix.strip("/")
        self.client = client if client is not None else boto3.client("s3")
        self.read_scheme = read_scheme

    # ---------------------------------------------------------------- #
    def _key(self, path: str) -> str:
        p = path.replace(os.sep, "/").lstrip("/")
        return f"{self.prefix}/{p}" if self.prefix else p

    def _is_missing(self, err: ClientError) -> bool:
        code = err.response.get("Error", {}).get("Code", "")
        return code in _MISSING_CODES

    # ---------------------------------------------------------------- #
    def list_names(self, dirpath: str) -> list[str]:
        base = self._key(dirpath) + "/"
        names: list[str] = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(
            Bucket=self.bucket, Prefix=base, Delimiter="/"
        ):
            for obj in page.get("Contents", []):
                names.append(obj["Key"][len(base):])
            for pre in page.get("CommonPrefixes", []):
                names.append(pre["Prefix"][len(base):].rstrip("/"))
        if not names:
            raise FileNotFoundError(dirpath)
        return names

    def read_bytes(self, path: str) -> bytes:
        try:
            resp = self.client.get_object(
                Bucket=self.bucket, Key=self._key(path)
            )
        except ClientError as e:
            if self._is_missing(e):
                raise FileNotFoundError(path) from e
            raise
        return resp["Body"].read()

    def put_if_absent(self, path: str, payload: bytes) -> bool:
        for _ in range(8):
            try:
                self.client.put_object(
                    Bucket=self.bucket,
                    Key=self._key(path),
                    Body=payload,
                    IfNoneMatch="*",
                )
                return True
            except ClientError as e:
                code = e.response.get("Error", {}).get("Code", "")
                if code in ("PreconditionFailed", "412"):
                    return False
                # concurrent conditional writes against the same key can
                # surface 409 while the winner is in flight — the key may
                # STILL be absent afterwards, so 409 must retry, not
                # report a loss (AWS documents this distinct from 412).
                # Real S3's documented code for a concurrent If-None-Match
                # conflict is ConditionalRequestConflict (round-15
                # ADVICE); moto and older stacks surface OperationAborted
                # / ConflictError. Bounded so a persistent 409 surfaces.
                if code not in (
                    "ConditionalRequestConflict",
                    "OperationAborted",
                    "ConflictError",
                    "409",
                ):
                    raise
        raise TimeoutError(
            f"put_if_absent({path}): persistent 409 conflict — another "
            "writer is thrashing this key"
        )

    def put_atomic(self, path: str, payload: bytes) -> None:
        self.client.put_object(
            Bucket=self.bucket, Key=self._key(path), Body=payload
        )

    def publish_file(self, src: str, dest: str) -> None:
        self.client.upload_file(src, self.bucket, self._key(dest))
        os.remove(src)  # the bucket owns the bytes now

    def delete_file(self, path: str) -> None:
        self.client.delete_object(Bucket=self.bucket, Key=self._key(path))

    def delete_dir(self, path: str) -> None:
        base = self._key(path) + "/"
        paginator = self.client.get_paginator("list_objects_v2")
        batch: list[dict] = []
        for page in paginator.paginate(Bucket=self.bucket, Prefix=base):
            for obj in page.get("Contents", []):
                batch.append({"Key": obj["Key"]})
                if len(batch) == 1000:  # DeleteObjects hard limit
                    self.client.delete_objects(
                        Bucket=self.bucket, Delete={"Objects": batch}
                    )
                    batch = []
        if batch:
            self.client.delete_objects(
                Bucket=self.bucket, Delete={"Objects": batch}
            )

    def mtime(self, path: str) -> float:
        try:
            head = self.client.head_object(
                Bucket=self.bucket, Key=self._key(path)
            )
        except ClientError as e:
            if self._is_missing(e):
                raise FileNotFoundError(path) from e
            raise
        return head["LastModified"].timestamp()

    def list_data_files(self, table: str) -> list[tuple[str, float]]:
        base = self._key(table) + "/"
        out: list[tuple[str, float]] = []
        paginator = self.client.get_paginator("list_objects_v2")
        for page in paginator.paginate(Bucket=self.bucket, Prefix=base):
            for obj in page.get("Contents", []):
                rel = obj["Key"][len(base):]
                segs = rel.split("/")
                if "_log" in segs[:-1] or any(
                    s.startswith("_stage-") for s in segs[:-1]
                ):
                    continue
                name = segs[-1]
                if name.startswith("part-") and name.endswith(".parquet"):
                    out.append(
                        (rel.replace("/", os.sep), obj["LastModified"].timestamp())
                    )
        return out

    def resolve_read_path(self, table: str, rel: str) -> str:
        key = self._key(os.path.join(table, rel) if rel else table)
        return f"{self.read_scheme}://{self.bucket}/{key}"
