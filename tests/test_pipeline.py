"""End-to-end composition test: the reference's canonical workflow —
XML dump → flattened revisions → temporal filtering → consecutive-pair
analysis → columnar sink — chained through this repo's adapters and
operator building blocks on a synthetic dump."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.test_formats import MINI_DUMP


def test_dump_to_pair_analysis_roundtrip(spark, tmp_path):
    from hedera_spark.sources.formats import read_revision_xml, skip_non_articles
    from hedera_spark.sources.sinks import write_parquet

    dump = tmp_path / "dump.xml"
    dump.write_text(MINI_DUMP)

    revs = skip_non_articles(read_revision_xml(spark, str(dump)))

    # the rev_pairs window shape applied to parsed dump revisions
    w = Window.partitionBy("page_id").orderBy("timestamp", "rev_id")
    pairs = (
        revs.select(
            "page_id",
            F.lag("rev_id").over(w).alias("prev_rev_id"),
            F.col("rev_id").alias("cur_rev_id"),
            F.lag("text").over(w).alias("prev_text"),
            "text",
        )
        .where(F.col("prev_rev_id").isNotNull())
        .withColumn(
            "n_inserted",
            F.size(
                F.array_except(
                    F.array_distinct(F.split("text", " ")),
                    F.array_distinct(F.split("prev_text", " ")),
                )
            ),
        )
    )
    out = tmp_path / "pairs_out"
    write_parquet(pairs.drop("prev_text", "text"), str(out))

    back = spark.read.parquet(str(out)).collect()
    assert len(back) == 1  # Alpha has 2 revisions -> 1 pair; Talk page filtered
    row = back[0]
    assert (row["prev_rev_id"], row["cur_rev_id"]) == (100, 101)
    assert row["n_inserted"] == 1  # 'brave' added
