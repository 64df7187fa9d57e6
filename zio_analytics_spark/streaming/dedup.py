"""Streaming deduplication [EXT] — dedup at ingest time, before data lands.

(Cf. distributed streaming set-similarity join literature: candidate keys +
state-backed matching; here the exact tier, which covers the bulk of
duplicate volume in practice.)

- ``streaming_exact_dedup``: state-backed ``dropDuplicates`` on a content
  digest. Unbounded variant keeps all digests in the state store; the
  watermarked variant (``within_watermark=True``) bounds state to the
  watermark horizon — the right trade at 100 TB/day ingest where dupes
  cluster in time (re-crawls, retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_exact_dedup"]


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Keep the first-seen row per distinct content on an unbounded stream.

    With ``ts_col`` + ``watermark_delay``, uses ``dropDuplicatesWithinWatermark``
    so digest state expires once the watermark passes (bounded state);
    without, state grows with distinct-content count (exact forever-dedup).
    """
    with_digest = stream.withColumn("__digest", F.sha2(F.col(text_col), 256))
    if ts_col is not None and watermark_delay is not None:
        out = with_digest.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            ["__digest"]
        )
    else:
        out = with_digest.dropDuplicates(["__digest"])
    return out.drop("__digest")
