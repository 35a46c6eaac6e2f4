"""SparkSession builder tuned for this engine.

Defaults target local[N] testing but every knob is what we would set on a
1000-executor cluster: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), Arrow for the few Pandas-UDF paths, sensible
broadcast threshold. Shuffle partitions default to the local core count;
on a real cluster this is overridden (or left to AQE's coalescing with a
high initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "hedera_spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # dozens of codegen-heavy queries in one JVM exhaust the default
        # 240m code cache; once full, JIT disables and generated code runs
        # interpreted (measured 10-20x slowdowns late in bench runs)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.sql.session.timeZone", "UTC")
        # the test corpus stores nanosecond parquet timestamps, which Spark
        # only reads via the legacy long path (SPARK-40819); tables.py
        # converts the long back to a proper TimestampType column
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def reset_session_state(spark: SparkSession) -> None:
    """Return a long-lived session to a plan-clean state between
    materialized queries.

    Two kinds of state accumulate across queries in one session and
    change LATER plans, not just memory pressure:

    - Persisted intermediates (the shingle kernel in operators/dedup.py
      and operators/text_analysis.py, graph frontiers, ...). Spark's
      CacheManager substitutes a cached subtree into any new plan that
      contains it, and AQE does NOT reuse exchanges across the resulting
      TableCacheQueryStage nodes — so e.g. a leaked `_shingles` cache
      makes dedup_simhash/dedup_minhash compute their fingerprint
      aggregate on BOTH sides of the band self-join (the r4
      ReusedExchange win silently evaporates).
    - The in-process model registries (kmeans._CENTROID_REGISTRY,
      importance._LR_REGISTRY): trained once per sf_dir, so a timing rep
      after the first measures scoring only, and a query after an
      in-place data rewrite scores under a stale model.

    bench.py calls this between reps; the plan-audit tests call it
    before asserting plan shapes; any driver embedding the engine in a
    long-lived session should call it between independent queries.
    """
    spark.catalog.clearCache()
    from hedera_spark.operators import importance, kmeans

    kmeans._CENTROID_REGISTRY.clear()
    importance._LR_REGISTRY.clear()
