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
    InputPartition,
    SimpleDataSourceStreamReader,
)

__all__ = ["SyntheticCorpusDataSource", "corpus_text", "register_synthetic_corpus"]

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

    def read(self, partition: _Shard) -> Iterator[tuple]:
        """Executed in the task: generate this shard's rows only."""
        for doc_id in range(partition.start, partition.end):
            yield (doc_id, corpus_text(doc_id), doc_id % 3)


class _CorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batched form of the same generator: the OFFSET is simply the
    next doc_id, each batch emits ``docs_per_batch`` documents until
    ``n_docs`` is reached. ``read`` advances the offset, ``readBetweenOffsets``
    regenerates any committed range deterministically — which is exactly
    what makes a custom streaming source replayable/exactly-once-able: the
    offset fully determines the data."""

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
