"""Physical-layout techniques for 100 TB joins (SURVEY.md §4): key salting
for skew and bucketing for shuffle-free co-located joins.

These are utilities, not queries: the correctness-gate operators stay
declarative and let AQE handle moderate skew, but at extreme scale both
techniques are applied deliberately — salting when one key dominates a
shuffle (a mega-page in a revision corpus, a bot user in a pageview log),
bucketing when the same high-cardinality join key is reused across many
queries (orderkey, page_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a random salt in
    [0, salt), the small side is replicated `salt` times, and the join key
    becomes (key, salt). One hot key now lands on `salt` tasks instead of
    one. Use when a single key's row count dwarfs the rest and AQE's
    skew-split isn't enough (e.g. the join is not sort-merge).

    Only inner/left joins are supported: under right/full semantics an
    unmatched replicated small-side row would surface `salt` times."""
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: replicating "
            "the small side breaks right/full outer semantics"
        )
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    out = salted_big.join(replicated_small, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
) -> None:
    """Persist a table bucketed+sorted by the join key. Two tables bucketed
    the same way join with ZERO shuffle (no Exchange in the plan) — the
    100 TB answer for a join key reused across many queries."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables; Catalyst elides both shuffles."""
    return spark.table(left_table).join(spark.table(right_table), key)
