"""[EXT] Custom Python DataSource (Spark 4 DataSource V2 Python API).

The reference's only source is ``fromLiterals`` (/root/reference/src/main/
scala/zio/analytics/DataStream.scala:87-88) — a driver-side literal list.
This module shows the SCALABLE form of a programmatic source: a registered
``DataSource`` whose reader plans N :class:`InputPartition` shards and
GENERATES each shard's rows inside its task — nothing flows from the
driver. That is the 100 TB synthetic-corpus shape (each of 10k partitions
derives its rows from (seed, partition id) independently), and the same
extension point a custom format/connector would use.

The generator is deliberately ARITHMETIC (doc_id-derived vocabulary picks)
so a SQL oracle can replay every row exactly — the source is correctness-
checkable end to end, not just demo plumbing.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

__all__ = [
    "SyntheticCorpusDataSource",
    "JsonlSinkDataSource",
    "corpus_text",
    "register_synthetic_corpus",
    "register_jsonl_sink",
]

#: tiny vocabulary; picks are pure doc_id arithmetic (SQL-replicable)
_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]


def corpus_text(doc_id: int) -> str:
    """The deterministic per-document text: ``n_words = 3 + doc_id % 5``
    words, word k = VOCAB[(doc_id * 7 + k * 3) % 8]. Pure integer
    arithmetic — replayed verbatim by the DuckDB oracle."""
    n_words = 3 + doc_id % 5
    return " ".join(_VOCAB[(doc_id * 7 + k * 3) % 8] for k in range(n_words))


class _Shard(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class _CorpusReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_shards = int(options.get("n_shards", 8))

    def partitions(self) -> Sequence[InputPartition]:
        """Plan one shard per partition — row ranges, no data on the driver."""
        step = -(-self.n_docs // self.n_shards)
        return [
            _Shard(lo, min(lo + step, self.n_docs))
            for lo in range(0, self.n_docs, step)
        ]

    def read(self, partition: _Shard) -> Iterator:
        """Executed in the task: generate this shard's rows only — as
        ``pyarrow.RecordBatch``es (Spark 4's Python DataSource accepts
        Arrow batches from ``read()``; per-row tuple emission pays a
        10-50× serialization tax on wide tables — round-14 verdict).
        Batches are capped at 64k rows so a huge shard never materializes
        as one Python list."""
        import pyarrow as pa

        for lo in range(partition.start, partition.end, 65536):
            hi = min(lo + 65536, partition.end)
            ids = range(lo, hi)
            yield pa.record_batch(
                [
                    pa.array(ids, pa.int64()),
                    pa.array([corpus_text(d) for d in ids], pa.string()),
                    pa.array([d % 3 for d in ids], pa.int32()),
                ],
                names=["doc_id", "text", "shard"],
            )


class _CorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched form of the same generator: the OFFSET is simply the
    next doc_id, each batch emits ``docs_per_batch`` documents until
    ``n_docs`` is reached. ``read`` advances the offset, ``readBetweenOffsets``
    regenerates any committed range deterministically — which is exactly
    what makes a custom streaming source replayable/exactly-once-able: the
    offset fully determines the data.

    This SIMPLE stream reader stays on tuple emission by design: its
    contract prefetches rows on the DRIVER (pyspark's
    SimpleDataSourceStreamReader seam), so Arrow batching buys nothing
    here — the partition-planned readers (lake_cdf, the batch reader
    above) are the Arrow paths."""

    def __init__(self, options) -> None:
        self.n_docs = int(options.get("n_docs", 1000))
        self.per_batch = int(options.get("docs_per_batch", 250))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = int(start["next"])
        hi = min(lo + self.per_batch, self.n_docs)
        return self._rows(lo, hi), {"next": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(int(start["next"]), int(end["next"]))

    def _rows(self, lo: int, hi: int):
        return iter([(d, corpus_text(d), d % 3) for d in range(lo, hi)])


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus").option("n_docs", N)`` source —
    batch AND streaming (``spark.readStream.format("synthetic_corpus")``)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, text string, shard int"

    def reader(self, schema) -> DataSourceReader:
        return _CorpusReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _CorpusStreamReader(self.options)


def register_synthetic_corpus(spark) -> None:
    spark.dataSource.register(SyntheticCorpusDataSource)


# --------------------------------------------------------------------- #
# Custom Python WRITER (the sink half of the V2 Python API)

class _JsonlCommit(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int) -> None:
        self.path = path
        self.n_rows = n_rows


class _JsonlWriter(DataSourceWriter):
    """Task-side writer: one JSONL file per partition, staged under a
    dot-prefixed tmp name. Publication happens ONLY in ``commit`` (driver,
    after every task succeeded): the driver renames exactly the tmp files
    named in the winning attempts' commit messages, so a speculative or
    retried-after-success task attempt leaves an orphan tmp (swept by
    commit) rather than a second published part file — the real two-phase
    output-commit contract. ``overwrite`` is honored driver-side: stale
    ``part-*`` files are cleared in ``__init__`` (which runs on the driver,
    before tasks launch)."""

    def __init__(self, options, overwrite: bool) -> None:
        import glob
        import os

        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_sink requires .option('path', ...)")
        os.makedirs(self.path, exist_ok=True)
        if overwrite:
            for stale in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                os.remove(stale)
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)

    def write(self, iterator) -> "_JsonlCommit":
        import json
        import os
        import uuid

        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        # stay under the tmp name — commit() publishes winners only
        return _JsonlCommit(tmp, n)

    def commit(self, messages) -> None:
        import glob
        import json
        import os

        winners = set()
        total = 0
        for m in messages:
            final = m.path.replace("/.tmp-", "/part-")
            os.rename(m.path, final)
            winners.add(m.path)
            total += m.n_rows
        # sweep tmp files from losing speculative/zombie attempts
        for orphan in glob.glob(os.path.join(self.path, ".tmp-*.jsonl")):
            if orphan not in winners:
                os.remove(orphan)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": len(messages), "rows": total}, f)

    def abort(self, messages) -> None:
        import glob
        import os

        # nothing was published (tmps only) — remove every staged file
        for orphan in glob.glob(os.path.join(self.path, ".tmp-*.jsonl")):
            os.remove(orphan)


class JsonlSinkDataSource(DataSource):
    """``df.write.format("jsonl_sink").option("path", dir).save()`` —
    the WRITER half of the Python DataSource API (reader + streamReader
    live on synthetic_corpus): per-task atomic file writes, two-phase
    commit with a _SUCCESS manifest, abort cleanup."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlWriter(self.options, overwrite)


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
