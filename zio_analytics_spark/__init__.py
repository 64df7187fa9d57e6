"""zio_analytics_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of zio/zio-analytics (reference read-only at
/root/reference/), re-expressed Spark-first.

The reference is a typed streaming-dataflow semantics contract (SURVEY.md);
this package maps every operator onto DataFrame / Structured Streaming
primitives and extends the surface with the relational and LLM-data-pipeline
layers the reference lacks (SURVEY.md §2.4).
"""

from zio_analytics_spark.datastream import DataStream
from zio_analytics_spark.session import get_spark
from zio_analytics_spark.windows import WindowAssigner, session, sliding, tumbling

__all__ = [
    "DataStream",
    "WindowAssigner",
    "get_spark",
    "session",
    "sliding",
    "tumbling",
]

__version__ = "0.1.0"
