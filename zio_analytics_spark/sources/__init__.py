"""Sources: bounded (parquet, literals) and unbounded (rate, files, memory).

The reference's only source is ``fromLiterals``
(/root/reference/src/main/scala/zio/analytics/DataStream.scala:87-88); everything
else here is [EXT] per SURVEY.md §2.4.
"""

from zio_analytics_spark.sources.literals import from_literals
from zio_analytics_spark.sources.parquet import TABLES, load_tables, read_parquet, read_table
from zio_analytics_spark.sources.streaming import rate_stream, stream_parquet

__all__ = [
    "TABLES",
    "from_literals",
    "load_tables",
    "rate_stream",
    "read_parquet",
    "read_table",
    "stream_parquet",
]
