"""Output sinks — Spark-first equivalents of the reference's output side
(reference: TextOutputFormat/SequenceFileOutputFormat usage across
java/main/org/hedera/mapreduce/*.java and the bz2-compressed JSON stores in
pig/utils/XML2JSON.pig, pig/preprocess/sortRevisions.pig).

The reference writes compressed text/sequence files; the Spark-first
answer is columnar parquet (predicate pushdown + pruning for every
downstream reader) with partitioning as the explicit scale lever, and
JSON/CSV for interchange. Compression is a codec option, not a format."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Columnar sink. `partition_by` maps to hive-style directory
    partitioning — the 100 TB lever that turns downstream time/key filters
    into partition pruning instead of full scans."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_json(df: DataFrame, path: str, compression: str = "gzip", mode: str = "overwrite") -> None:
    """JSON-lines sink (the reference's JsonStorage + BZip2Codec analog)."""
    df.write.mode(mode).option("compression", compression).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV interchange sink (the reference's flattened-CSV workflow,
    WIKIREVISION.md §3.1)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_parquet_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "Column"],
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> dict:
    """Parquet write with in-flight data-quality metrics via Spark's
    Observation API: the named aggregate expressions are computed ON THE
    WRITE PASS itself (accumulator-style, no second scan) and returned
    as a dict — the write-time audit a 100 TB pipeline wants instead of
    a follow-up validation job re-reading what it just wrote.

    Reference parity: the reference's MapReduce jobs report Hadoop
    counters per job (row counts, skipped records); this is that
    counter surface, typed and declarative.

    metrics: name -> aggregate Column (e.g. F.count(F.lit(1)),
    F.sum("n_chars"), F.count_if(F.col("text").isNull())).
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    w = observed.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
    return obs.get


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC columnar sink — the second columnar format (the reference's
    SequenceFile role: splittable, typed, compressed). Same pushdown /
    pruning story as parquet; useful when downstream consumers are
    Hive/ORC-native."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)
