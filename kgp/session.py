"""SparkSession factory with scale-oriented defaults.

Tuned for the sandbox (single-JVM local[N]) but every knob is the one you
would set on a 1000-executor cluster: AQE on (runtime re-planning +
skew-join splitting), Arrow-vectorized Python UDF transport with large
batches, shuffle partitions sized to cores (overridden upward on a real
cluster), UTC session timezone for deterministic timestamps.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Rows per Arrow batch into pandas UDFs. Small on purpose: with real
# web pages (tens of KB of html each) a 2048-row batch is ~150 MB that
# the Python worker must materialize at once — measured 6.8x slower
# than 256-row batches on the heavy corpus (memory pressure + no
# pipelining). 256 rows ≈ 5-20 MB keeps workers streaming; for tiny
# rows the per-batch overhead is noise.
ARROW_BATCH = "256"


def get_spark(
    app_name: str = "kgp",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", ARROW_BATCH)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("KGP_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    _warm_collation(spark)
    return spark


def _warm_collation(spark: SparkSession) -> None:
    """Force the one-time ICU/collation class init (Spark 4's
    CollationAwareUTF8String static initializer) in a single task
    BEFORE any wide stage runs. Without this, the first stage that
    calls lower()/upper() with 32 concurrent tasks serializes them all
    on the class-init monitor — measured 20-70 s of stall; warmed, the
    init costs <1 s once per JVM."""
    from pyspark.sql import functions as F
    try:
        spark.range(1).select(
            F.lower(F.concat(F.lit("Ä"), F.col("id").cast("string")))
        ).collect()
    except Exception:
        pass  # never let warmup break session creation
