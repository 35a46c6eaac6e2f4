def test_sink_roundtrips(spark, tmp_path):
    from hedera_spark.sources.sinks import write_csv, write_json, write_parquet
    from hedera_spark.sources.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    write_parquet(df, str(tmp_path / "p"), partition_by=["lang"])
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == df.count()
    # partition pruning: a lang filter must prune directories
    pruned = back.where(back.lang == "de")
    assert pruned.count() == df.where(df.lang == "de").count()

    write_json(df.limit(10), str(tmp_path / "j"))
    assert spark.read.json(str(tmp_path / "j")).count() == 10

    write_csv(df.select("doc_id", "lang").limit(10), str(tmp_path / "c"))
    assert spark.read.option("header", True).csv(str(tmp_path / "c")).count() == 10


def test_write_orc_roundtrips_with_partition_pruning(spark, tmp_path):
    from hedera_spark.sources.sinks import write_orc
    from hedera_spark.sources.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    write_orc(df, str(tmp_path / "o"), partition_by=["lang"])
    back = spark.read.orc(str(tmp_path / "o"))
    assert back.count() == df.count()
    assert back.where(back.lang == "de").count() == df.where(df.lang == "de").count()
    # round-trip values, not just counts
    a = df.select("doc_id", "n_chars").toPandas().sort_values("doc_id").reset_index(drop=True)
    b = back.select("doc_id", "n_chars").toPandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)


def test_read_evolved_parquet_merges_schema_generations(spark, tmp_path):
    """Files written before a column existed must read as NULL for it;
    newer files keep their values — no rewrite of old generations."""
    from pyspark.sql import functions as F

    from hedera_spark.sources.formats import read_evolved_parquet
    from hedera_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    gen1 = docs.select("doc_id", "text").where(F.col("doc_id") % 2 == 0)
    gen2 = docs.select(
        "doc_id", "text", F.length("text").alias("quality")
    ).where(F.col("doc_id") % 2 == 1)
    gen1.write.parquet(str(tmp_path / "lake" / "gen=1"))
    gen2.write.parquet(str(tmp_path / "lake" / "gen=2"))

    merged = read_evolved_parquet(spark, str(tmp_path / "lake"))
    assert set(merged.columns) >= {"doc_id", "text", "quality"}
    assert merged.count() == docs.count()
    assert merged.where(F.col("quality").isNull()).count() == gen1.count()
    assert merged.where(F.col("quality").isNotNull()).count() == gen2.count()


def test_write_parquet_observed_reports_write_pass_metrics(spark, tmp_path):
    """The Observation metrics must equal separately-computed aggregates
    and the write must land the same rows — one scan, both jobs done."""
    from pyspark.sql import functions as F

    from hedera_spark.sources.sinks import write_parquet_observed
    from hedera_spark.sources.tables import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = write_parquet_observed(
        df,
        str(tmp_path / "obs"),
        {
            "n_rows": F.count(F.lit(1)),
            "n_null_text": F.count_if(F.col("text").isNull()),
            "sum_chars": F.sum("n_chars"),
        },
    )
    want_rows = df.count()
    assert got["n_rows"] == want_rows
    assert got["n_null_text"] == df.where(F.col("text").isNull()).count()
    assert got["sum_chars"] == df.agg(F.sum("n_chars")).collect()[0][0]
    assert spark.read.parquet(str(tmp_path / "obs")).count() == want_rows
