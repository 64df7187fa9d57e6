"""SparkSession bootstrap tuned for this engine.

Local-mode defaults match the test container (local[32], single JVM), but every
setting here is chosen to also be the right default on a real cluster:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting, join
  strategy demotion) — the primary scale lever at 100 TB.
- ``spark.sql.shuffle.partitions`` is a *starting* value; AQE coalesces it at
  runtime, so a moderate local value doesn't bake in a cluster bottleneck.
- UTC session timezone so results are comparable with the (UTC-naive) DuckDB
  oracle and deterministic across deployments.
- Arrow enabled so the Pandas-UDF escape hatches are vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_CONFIG"]

DEFAULT_CONFIG: dict[str, str] = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # The driver's events table stores TIMESTAMP(NANOS) which Spark's reader
    # rejects; read as long nanos and convert in sources.parquet.read_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Streaming state at scale would use RocksDB; harmless default locally.
    "spark.sql.shuffle.spill.compress": "true",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "zio_analytics_spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or ``local[*]``) when
    no cluster master is configured; on a real deployment the submitter's
    ``--master`` wins because an existing session is reused.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in DEFAULT_CONFIG.items():
        builder = builder.config(k, v)
    if os.environ.get("SPARK_LOCAL_MODE", "1") != "0":
        # Single-JVM local mode: the driver is the only executor.
        builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _hook_scratch_cleanup(spark)
    # Crash-robust scratch hygiene: atexit cleanup cannot run when a prior
    # process was SIGKILLed, so every new session sweeps dead-pid scratch
    # parents (see tmpdirs.sweep_stale) before doing any work of its own.
    from zio_analytics_spark import tmpdirs

    tmpdirs.sweep_stale()
    return spark


def _hook_scratch_cleanup(spark: SparkSession) -> None:
    """Wrap ``spark.stop`` so session-scoped scratch dirs (materialized
    dedup/ANN intermediates — see :mod:`zio_analytics_spark.tmpdirs`) are
    removed when the session ends; atexit covers processes that never call
    stop(). Idempotent: getOrCreate may hand back the same session."""
    if getattr(spark, "_zas_scratch_hooked", False):
        return
    original_stop = spark.stop

    def stop_and_cleanup(*args, **kwargs):
        from zio_analytics_spark import tmpdirs

        tmpdirs.cleanup()
        return original_stop(*args, **kwargs)

    spark.stop = stop_and_cleanup
    spark._zas_scratch_hooked = True
