"""Edge-case behavior: operators must handle empty and degenerate inputs
without exceptions (the 100 TB reality: some partition, day, or page is
always empty)."""

from __future__ import annotations

import pytest


def _empty_sf(spark, tmp_path):
    """An sf_dir whose documents/events tables have the right schemas and
    zero rows."""
    docs = spark.createDataFrame(
        [],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = tmp_path / "empty"
    docs.write.parquet(str(out / "documents.parquet"))
    ev.write.parquet(str(out / "events.parquet"))
    return str(out)


@pytest.mark.parametrize(
    "qname",
    [
        "rev_diff",
        "rev_pairs",
        "dedup_minhash",
        "dedup_simhash",
        "dedup_ngram_jaccard",
        "fingerprint",
        "anchor_count",
        "term_stats",
        "pv_daily",
        "session_stats",
        "lang_id",
        "rev_diff_chunks",
        "dedup_clusters",
    ],
)
def test_operators_tolerate_empty_input(spark, tmp_path, qname):
    from hedera_spark.registry import QUERIES

    sf = _empty_sf(spark, tmp_path)
    assert QUERIES[qname](spark, sf).count() == 0


def test_single_token_docs_shingle_safely(spark, tmp_path):
    """Docs shorter than the shingle width exercise the descending-sequence
    guard — they must contribute zero shingles, not crash."""
    docs = spark.createDataFrame(
        [(1, "a", "p", "en", 1), (2, "b c", "p", "en", 3), (3, "d e f g", "q", "en", 7)],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    out = tmp_path / "tiny"
    docs.write.parquet(str(out / "documents.parquet"))
    from hedera_spark.operators.dedup import _shingles

    per_doc = {r["doc_id"]: r["cnt"] for r in _shingles(spark, str(out)).groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    assert per_doc.get(1) is None  # 1 token -> no shingles
    assert per_doc.get(2) is None  # 2 tokens -> no shingles
    assert per_doc[3] == 2  # 4 tokens -> 2 trigrams
