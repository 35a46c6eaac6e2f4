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
