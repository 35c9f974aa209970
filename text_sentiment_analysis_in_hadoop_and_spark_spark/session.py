"""SparkSession factory tuned for the engine.

The reference hand-tunes parallelism per job (3 reduce tasks,
max-split-size CLI knobs — /root/reference/Hadoop/NB.java:295,301,326).
Here the equivalents are declarative: AQE re-plans partition counts at
runtime, shuffle partitions default to the core count, and broadcast
joins replace the reference's hand-rolled in-memory model map
(/root/reference/Hadoop/NB.java:161-194).

At 100 TB scale the same settings hold: AQE coalesces/splits skewed
shuffle partitions, `spark.sql.files.maxPartitionBytes` bounds scan
task size, and the UTC session timezone keeps timestamp semantics
engine-portable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "tsa_spark_engine",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    Local mode is a single JVM; on a real cluster the same config is
    what we'd ship: AQE on (runtime coalescing + skew-join splitting),
    Arrow enabled for the few Pandas-UDF extension operators.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # session-wide requirement (ADVICE r2): the driver's events
        # parquet stores TIMESTAMP(NANOS), which the vectorized reader
        # rejects; reading it as long is part of the engine's contract,
        # declared ONCE here instead of mutated mid-session by readers
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
